"""Patch / scale operations (flax.linen, NHWC — TPU-native layout).

Re-designs esc/modules/transformer/scale.py for XLA: tuple-factor pixel
shuffle/unshuffle are pure reshape+transpose (fused for free by XLA),
convolutions run channels-last.

Token tensors are ``(B, H*W, C)`` row-major over (H, W), matching the
reference's semantics so converted checkpoints are drop-in.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle", "PatchEmbed", "PatchDeEmbed",
           "PatchMerge", "PatchSplit"]


def pixel_unshuffle(x: jnp.ndarray, factor: Sequence[int] = (2, 1)) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/s1, W/s2, C*s1*s2); channel layout [s1, s2, C].

    Mirrors esc/modules/transformer/scale.py:7-14.
    """
    s1, s2 = factor
    B, H, W, C = x.shape
    x = x.reshape(B, H // s1, s1, W // s2, s2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // s1, W // s2, C * s1 * s2)


def pixel_shuffle(x: jnp.ndarray, factor: Sequence[int] = (2, 1)) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*s1, W*s2, C/(s1*s2)); inverse of unshuffle.

    Mirrors esc/modules/transformer/scale.py:16-23.
    """
    s1, s2 = factor
    B, H, W, C = x.shape
    c = C // (s1 * s2)
    x = x.reshape(B, H, W, s1, s2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * s1, W * s2, c)


class PatchEmbed(nn.Module):
    """2D linear patchify: strided conv + token LayerNorm.

    Mirrors esc/modules/transformer/scale.py:26-50. Input is the complex
    spectrum feature ``(B, F, T, 2)`` (NHWC); output ``(B, H*W, C)`` tokens
    for the transformer backbone or ``(B, H, W, C)`` for convolution.
    """

    freq: int = 192
    in_chans: int = 2
    patch_size: Sequence[int] = (3, 2)
    embed_dim: int = 48
    backbone: str = "transformer"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = tuple(self.patch_size)
        x = nn.Conv(self.embed_dim, kernel_size=p, strides=p, padding="VALID",
                    name="proj")(x)  # (B, H, W, C)
        if self.backbone == "convolution":
            return x
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        return nn.LayerNorm(name="norm")(x)


class PatchDeEmbed(nn.Module):
    """2D linear de-patchify: conv -> pixel shuffle -> conv.

    Mirrors esc/modules/transformer/scale.py:52-81. Returns the
    reconstructed spectrum feature ``(B, F, T, 2)`` (NHWC).
    """

    freq: int = 192
    in_chans: int = 2
    patch_size: Sequence[int] = (3, 2)
    embed_dim: int = 48
    backbone: str = "transformer"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = tuple(self.patch_size)
        H = self.freq // p[0]
        if self.backbone == "transformer":
            B, L, C = x.shape
            x = x.reshape(B, H, L // H, C)
        x = nn.Conv(self.embed_dim * p[0] * p[1], kernel_size=(5, 5),
                    strides=(1, 1), padding=2, name="de_proj1")(x)
        x = pixel_shuffle(x, p)  # (B, F, T, embed_dim)
        x = nn.Conv(self.in_chans, kernel_size=(3, 3), strides=(1, 1),
                    padding=1, name="de_proj2")(x)
        return x


class PatchMerge(nn.Module):
    """Downscale: pixel-unshuffle by scale_factor + LN + Linear down.

    Mirrors esc/modules/transformer/scale.py:83-115. Tokens in, tokens out.
    """

    in_dim: int
    out_dim: int
    scale_factor: Sequence[int] = (2, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int) -> jnp.ndarray:
        s1, s2 = self.scale_factor
        B, L, C = x.shape
        x = x.reshape(B, H, L // H, C)
        if H % s1:  # zero-pad odd H (reference scale.py:106-108)
            x = jnp.pad(x, ((0, 0), (0, s1 - H % s1), (0, 0), (0, 0)))
        x = pixel_unshuffle(x, (s1, s2))
        B2, H2, W2, C2 = x.shape
        x = x.reshape(B2, H2 * W2, C2)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="down")(x)


class PatchSplit(nn.Module):
    """Upscale: LN + Linear up + pixel-shuffle by scale_factor.

    Mirrors esc/modules/transformer/scale.py:117-145.
    """

    in_dim: int
    out_dim: int
    scale_factor: Sequence[int] = (2, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int) -> jnp.ndarray:
        s1, s2 = self.scale_factor
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.out_dim * s1 * s2, use_bias=False, name="up")(x)
        B, L, C = x.shape
        x = x.reshape(B, H, L // H, C)
        x = pixel_shuffle(x, (s1, s2))
        B2, H2, W2, C2 = x.shape
        return x.reshape(B2, H2 * W2, C2)
