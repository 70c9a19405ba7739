"""Base codec components: STFT frontend helpers, Encoder, plain Decoder.

Re-design of esc/models/base.py for JAX/flax. The STFT frontend is the
pure-function pair in :mod:`esc_tpu.ops.stft`; quantizer construction
lives in the codec facades (esc_tpu/models/codecs.py). The
encoder/decoder mirror the reference's layer stacking exactly
(esc/models/base.py:110-203) while keeping every shape static under jit.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..modules.convolution import Convolution2D, ConvolutionLayer
from ..modules.scale import PatchDeEmbed, PatchEmbed
from ..modules.transformer import TransformerLayer

__all__ = ["Encoder", "Decoder", "max_bps"]


def max_bps(overlap: int, max_streams: int, codebook_size: int,
            group_size: int, time_patch: int) -> float:
    """Maximum bitrate in kbps (reference formula, esc/models/base.py:70)."""
    return (2 / overlap) * max_streams * math.log2(codebook_size) \
        * group_size // (20 * time_patch // 2)


class Encoder(nn.Module):
    """Patch-embed + pre_nn + 5 down-scaling layers; returns hidden states
    at all scales (esc/models/base.py:110-158).

    Input: complex spectrum feature ``(B, 2, F, T)``.
    Output: (enc_hs list, (H, W) bottom feature shape).
    """

    backbone: str = "transformer"
    in_freq: int = 192
    in_dim: int = 2
    h_dims: Sequence[int] = (45, 72, 96, 144, 192, 384)
    patch_size: Sequence[int] = (3, 2)
    kernel_size: Sequence[int] = (5, 2)
    conv_depth: int = 1
    swin_heads: Sequence[int] = (3, 6, 12, 24, 24)
    swin_depth: int = 2
    window_size: int = 4
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        h = list(self.h_dims)
        in_dims, out_dims = h[:-1], h[1:]
        if self.backbone == "convolution":
            self.patch_embed = PatchEmbed(self.in_freq, self.in_dim,
                                          tuple(self.patch_size), h[0],
                                          backbone="convolution")
            self.pre_nn = Convolution2D(h[0], h[0], tuple(self.kernel_size),
                                        scale=False, dtype=self.dtype)
            self.blocks = [ConvolutionLayer(in_dims[i], out_dims[i],
                                            self.conv_depth,
                                            tuple(self.kernel_size),
                                            transpose=False, dtype=self.dtype,
                                            name=f"blocks_{i}")
                           for i in range(len(in_dims))]
        else:
            self.patch_embed = PatchEmbed(self.in_freq, self.in_dim,
                                          tuple(self.patch_size), h[0])
            self.pre_nn = TransformerLayer(h[0], h[0], self.swin_heads[0],
                                           self.swin_depth, self.window_size,
                                           self.mlp_ratio, scale=None,
                                           dtype=self.dtype)
            self.blocks = [TransformerLayer(in_dims[i], out_dims[i],
                                            self.swin_heads[i],
                                            self.swin_depth, self.window_size,
                                            self.mlp_ratio, scale="down",
                                            scale_factor=(2, 1),
                                            dtype=self.dtype,
                                            name=f"blocks_{i}")
                           for i in range(len(in_dims))]

    def __call__(self, x_feat: jnp.ndarray, training: bool = False
                 ) -> Tuple[List[jnp.ndarray], Tuple[int, int]]:
        B, C, F, T = x_feat.shape
        H, W = F // self.patch_size[0], T // self.patch_size[1]
        x = x_feat.transpose(0, 2, 3, 1)  # NHWC for the patchify conv
        x = self.patch_embed(x)

        if self.backbone == "convolution":
            x = self.pre_nn(x)            # (B, H, W, C), no scale change
            enc_hs = [x]
            for blk in self.blocks:
                x = blk(x, training)      # halves H
                H = H // 2
                enc_hs.append(x)
            return enc_hs, (H, W)

        x, H, W = self.pre_nn(x, H, W, training)
        enc_hs = [x]
        for blk in self.blocks:
            x, H, W = blk(x, H, W, training)
            enc_hs.append(x)
        return enc_hs, (H, W)


class Decoder(nn.Module):
    """Mirror decoder for the bottleneck-RVQ ablation path
    (esc/models/base.py:161-203): 5 up-scaling layers + post_nn +
    patch-de-embed; single latent input.
    """

    backbone: str = "transformer"
    in_freq: int = 192
    in_dim: int = 2
    h_dims: Sequence[int] = (384, 192, 144, 96, 72, 45)
    patch_size: Sequence[int] = (3, 2)
    kernel_size: Sequence[int] = (5, 2)
    conv_depth: int = 1
    swin_heads: Sequence[int] = (24, 24, 12, 6, 3)
    swin_depth: int = 2
    window_size: int = 4
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        h = list(self.h_dims)
        in_dims, out_dims = h[:-1], h[1:]
        if self.backbone == "convolution":
            self.blocks = [ConvolutionLayer(in_dims[i], out_dims[i],
                                            self.conv_depth,
                                            tuple(self.kernel_size),
                                            transpose=True, dtype=self.dtype,
                                            name=f"blocks_{i}")
                           for i in range(len(in_dims))]
            self.post_nn = Convolution2D(h[-1], h[-1], tuple(self.kernel_size),
                                         scale=False, dtype=self.dtype)
            self.patch_deembed = PatchDeEmbed(self.in_freq, self.in_dim,
                                              tuple(self.patch_size), h[-1],
                                              backbone="convolution")
        else:
            self.blocks = [TransformerLayer(in_dims[i], out_dims[i],
                                            self.swin_heads[i],
                                            self.swin_depth, self.window_size,
                                            self.mlp_ratio, scale="up",
                                            scale_factor=(2, 1),
                                            dtype=self.dtype,
                                            name=f"blocks_{i}")
                           for i in range(len(in_dims))]
            self.post_nn = TransformerLayer(h[-1], h[-1], self.swin_heads[-1],
                                            self.swin_depth, self.window_size,
                                            self.mlp_ratio, scale=None,
                                            dtype=self.dtype)
            self.patch_deembed = PatchDeEmbed(self.in_freq, self.in_dim,
                                              tuple(self.patch_size), h[-1])

    def __call__(self, z_q: jnp.ndarray, feat_shape: Tuple[int, int],
                 training: bool = False) -> jnp.ndarray:
        H, W = feat_shape
        if self.backbone == "convolution":
            for blk in self.blocks:
                z_q = blk(z_q, training)  # doubles H
            z_q = self.post_nn(z_q)
            out = self.patch_deembed(z_q)           # (B, F, T, 2)
        else:
            for blk in self.blocks:
                z_q, H, W = blk(z_q, H, W, training)
            z_q, H, W = self.post_nn(z_q, H, W, training)
            out = self.patch_deembed(z_q)           # (B, F, T, 2)
        return out.transpose(0, 3, 1, 2)            # (B, 2, F, T)
