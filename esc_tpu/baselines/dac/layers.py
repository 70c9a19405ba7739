"""DAC building blocks: snake activation + weight-normalized 1-D convs.

Re-design of baselines/descript/dac/nn/layers.py for flax, channels-last
``(B, T, C)``. The ``padded`` call argument implements the reference's
CodecMixin padding toggle (base.py:57-80): ``padded=False`` switches
every conv to VALID padding for chunked streaming inference.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["snake", "Snake1d", "WNConv1d", "WNConvTranspose1d"]


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + sin^2(alpha x)/alpha (layers.py:17-24), per-channel alpha."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class Snake1d(nn.Module):
    """Learnable per-channel snake activation (alpha init 1)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones,
                           (1, 1, self.channels))
        return snake(x, alpha)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d, (B, T, C) layout.

    ``padding`` follows torch semantics (symmetric sample count); set
    ``padded=False`` at call time to force VALID (streaming mode).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        p = self.padding if padded else 0
        return nn.WeightNorm(nn.Conv(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), kernel_dilation=(self.dilation,),
            padding=((p, p),), dtype=self.dtype), name="conv")(x)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d with torch crop semantics:
    full (VALID) transposed conv cropped by ``padding`` on both sides.
    ``transpose_kernel=True`` so converted torch weights drop in."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        y = nn.WeightNorm(nn.ConvTranspose(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), padding="VALID", transpose_kernel=True,
            dtype=self.dtype), name="conv")(x)
        p = self.padding if padded else 0
        if p:
            y = y[:, p:-p]
        return y


def conv_out_len(L: int, k: int, s: int, d: int, p: int) -> int:
    """torch Conv1d output length."""
    return (L + 2 * p - d * (k - 1) - 1) // s + 1


def convT_out_len(L: int, k: int, s: int, p: int) -> int:
    """torch ConvTranspose1d output length."""
    return (L - 1) * s - 2 * p + k


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)
