"""Convolutional backbone (ablation path), flax.linen NHWC.

Re-design of esc/modules/convolution/layers.py. All tensors are
channels-last ``(B, H, W, C)`` (XLA TPU's native conv layout); the
models transpose at the VQ boundary where the reference's
``(B, C, H, W)`` semantics are needed.

Transposed convolutions use ``transpose_kernel=True`` so converted
PyTorch ``ConvTranspose2d`` weights drop in directly.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Convolution2D", "ResidualUnit", "ConvolutionLayer", "PReLU"]


class PReLU(nn.Module):
    """torch.nn.PReLU with a single learnable slope (init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class Convolution2D(nn.Module):
    """Conv / ConvTranspose with the reference's crop rules (layers.py:3-28).

    scale=True halves (conv) or doubles (transpose) the H axis; W is
    always cropped back to its input length.
    """

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (5, 2)
    scale: bool = True
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = x.shape[1], x.shape[2]
        k = tuple(self.kernel_size)
        stride = (2, 1) if self.scale else (1, 1)
        if not self.transpose:
            y = nn.Conv(self.out_channels, kernel_size=k, strides=stride,
                        padding=((2, 2), (1, 1)), dtype=self.dtype,
                        name="conv")(x)
        else:
            # torch ConvTranspose2d(padding=(1,0)): full output cropped by
            # the padding on both sides of each spatial axis.
            y = nn.ConvTranspose(self.out_channels, kernel_size=k,
                                 strides=stride, padding="VALID",
                                 transpose_kernel=True, dtype=self.dtype,
                                 name="conv")(x)
            y = y[:, 1:-1, :, :]  # crop H padding of 1 (W padding is 0)
        if self.scale:
            y = y[:, : H * 2] if self.transpose else y[:, : H // 2]
        else:
            y = y[:, :H]
        return y[:, :, :W]


class ResidualUnit(nn.Module):
    """(Conv + BN + PReLU) x2 with skip (layers.py:30-46)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = Convolution2D(self.dim, self.dim, (5, 2), scale=False,
                          dtype=self.dtype, name="block_0")(x)
        y = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="block_1")(y)
        y = PReLU(name="block_2")(y)
        y = Convolution2D(self.dim, self.dim, (5, 2), scale=False,
                          dtype=self.dtype, name="block_3")(y)
        y = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="block_4")(y)
        y = PReLU(name="block_5")(y)
        return x + y


class ConvolutionLayer(nn.Module):
    """depth x ResidualUnit then a scaling conv + BN + PReLU
    (layers.py:49-63). Halves H (conv) or doubles it (transpose).
    """

    in_dim: int
    out_dim: int
    depth: int = 1
    kernel_size: Sequence[int] = (5, 2)
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        for i in range(self.depth):
            x = ResidualUnit(self.in_dim, dtype=self.dtype,
                             name=f"blocks_{i}")(x, training)
        x = Convolution2D(self.in_dim, self.out_dim, self.kernel_size,
                          scale=True, transpose=self.transpose,
                          dtype=self.dtype, name=f"blocks_{self.depth}")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name=f"blocks_{self.depth + 1}")(x)
        return PReLU(name=f"blocks_{self.depth + 2}")(x)
