"""Cross-scale residual vector quantization decoder.

Re-design of esc/models/csrvq.py. The decoder refines its features
scale-by-scale with quantized encoder-decoder residuals:

    residual_i = enc_hs[-1-i] - dec_hs[i]         (pre_fuse)
    dec_refine = VQ_i(residual_i) + dec_hs[i]     (post_fuse)

Training runs every scale and masks the non-transmitted ones by zeroing
their quantized latents and losses (csrvq.py:43-45) so all parameters
stay on the gradient path under SPMD data parallelism. ``num_streams``
is a static Python int (six jit variants at most), so inference shapes —
including the stacked codes ``(B, s, groups, T)`` — stay static.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..modules.convolution import Convolution2D, ConvolutionLayer
from ..modules.scale import PatchDeEmbed
from ..modules.transformer import TransformerLayer

__all__ = ["CrossScaleRVQDecoder"]


def _to_nchw(x):
    return x.transpose(0, 3, 1, 2)


def _to_nhwc(x):
    return x.transpose(0, 2, 3, 1)


class CrossScaleRVQDecoder(nn.Module):
    """Decoder with per-scale product VQs (esc/models/csrvq.py:63-183).

    The quantizer modules are owned by the codec facade and passed into
    each method (mirroring the reference call convention).
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

    # -- single-scale quantize/fuse ------------------------------------

    def _vq_apply(self, vq, residual, freeze_vq, training):
        """Run a product VQ on a residual in this backbone's layout."""
        if self.backbone == "convolution":
            out = vq(_to_nchw(residual), freeze_vq=freeze_vq,
                     training=training)
            out["z_q"] = _to_nhwc(out["z_q"])
            return out
        return vq(residual, freeze_vq=freeze_vq, training=training)

    def csrvq(self, enc, dec, vq, transmit, freeze_vq: bool,
              training: bool):
        """Quantize enc-dec residual and refine dec (csrvq.py:23-48).

        ``transmit`` may be a static bool or (in training) a traced 0/1
        scalar. Non-transmitted streams still run in training mode with
        losses/latents multiplied by zero (csrvq.py:43-45) — this keeps
        every parameter on the gradient path AND lets the whole training
        step compile once with ``num_streams`` as a device scalar. Eval
        (static bool) skips the dead compute entirely (csrvq.py:35-36);
        the numerics are identical.
        """
        if not training and transmit is False:
            return dec, 0.0, 0.0, None
        residual = enc - dec
        out = self._vq_apply(vq, residual, freeze_vq, training)
        residual_q, code = out["z_q"], out["codes"]
        cm_loss, cb_loss = out["cm_loss"], out["cb_loss"]
        live = jnp.asarray(transmit, jnp.float32)
        cm_loss = cm_loss * live
        cb_loss = cb_loss * live
        residual_q = residual_q * live
        return residual_q + dec, cm_loss, cb_loss, code

    def csrvq_encode(self, enc, dec, vq):
        residual = enc - dec
        if self.backbone == "convolution":
            return vq.encode(_to_nchw(residual))
        return vq.encode(residual)

    def csrvq_decode(self, codes, dec, vq):
        dims = 4 if self.backbone == "convolution" else 3
        residual_q = vq.decode(codes, dims)
        if self.backbone == "convolution":
            residual_q = _to_nhwc(residual_q)
        return residual_q + dec

    def _run_block(self, i, x, feat_shape, training):
        H, W = feat_shape
        if self.backbone == "convolution":
            x = self.blocks[i](x, training)
            return x, (H * 2, W)
        x, H, W = self.blocks[i](x, H, W, training)
        return x, (H, W)

    def _finish(self, x, feat_shape, training):
        H, W = feat_shape
        if self.backbone == "convolution":
            x = self.post_nn(x)
        else:
            x, H, W = self.post_nn(x, H, W, training)
        out = self.patch_deembed(x)        # (B, F, T, 2)
        return out.transpose(0, 3, 1, 2)   # (B, 2, F, T)

    # -- full passes ----------------------------------------------------

    def __call__(self, enc_hs: List[jnp.ndarray], num_streams,
                 quantizers, feat_shape: Tuple[int, int],
                 freeze_vq: bool = False, training: bool = False):
        """Step-wise cross-scale decoding (csrvq.py:97-129).

        Returns (recon_feat, codes, cm_loss, cb_loss); in training mode
        codes covers all ``max_streams`` scales and ``num_streams`` may
        be a traced int (one compiled step for every bitrate); in eval
        mode ``num_streams`` must be a static int and only transmitted
        codes are returned — exactly the reference semantics.
        """
        z0, cm_loss, cb_loss, code = self.csrvq(
            enc=enc_hs[-1], dec=0.0, vq=quantizers[0], transmit=True,
            freeze_vq=freeze_vq, training=training)
        codes, dec = [code], z0
        for i in range(len(self.blocks)):
            if training:
                transmit = (jnp.asarray(i, jnp.int32)
                            < jnp.asarray(num_streams, jnp.int32) - 1)
            else:
                transmit = bool(i < num_streams - 1)
            dec_refine, cm_i, cb_i, code_i = self.csrvq(
                enc=enc_hs[-1 - i], dec=dec, vq=quantizers[i + 1],
                transmit=transmit, freeze_vq=freeze_vq,
                training=training)
            cm_loss += cm_i
            cb_loss += cb_i
            if code_i is not None:
                codes.append(code_i)
            dec, feat_shape = self._run_block(i, dec_refine, feat_shape,
                                              training)
        recon_feat = self._finish(dec, feat_shape, training)
        return recon_feat, jnp.stack(codes, axis=1), cm_loss, cb_loss

    def encode(self, enc_hs: List[jnp.ndarray], num_streams: int,
               quantizers, feat_shape: Tuple[int, int]) -> jnp.ndarray:
        """Audio features -> multi-scale codes (csrvq.py:131-158).

        Runs only the first ``num_streams`` scales (early exit is free
        because ``num_streams`` is static).
        """
        dims = 4 if self.backbone == "convolution" else 3
        code0 = (quantizers[0].encode(_to_nchw(enc_hs[-1]))
                 if self.backbone == "convolution"
                 else quantizers[0].encode(enc_hs[-1]))
        if num_streams == 1:
            return code0[:, None]
        z0 = quantizers[0].decode(code0, dims)
        if self.backbone == "convolution":
            z0 = _to_nhwc(z0)
        codes, dec = [code0], z0
        for i in range(num_streams - 1):
            code_i = self.csrvq_encode(enc=enc_hs[-1 - i], dec=dec,
                                       vq=quantizers[i + 1])
            codes.append(code_i)
            if len(codes) == num_streams:
                break
            dec_refine = self.csrvq_decode(code_i, dec, quantizers[i + 1])
            dec, feat_shape = self._run_block(i, dec_refine, feat_shape,
                                              training=False)
        return jnp.stack(codes, axis=1)  # (B, num_streams, groups, T)

    def decode(self, codes: jnp.ndarray, quantizers,
               feat_shape: Tuple[int, int]) -> jnp.ndarray:
        """Multi-scale codes -> reconstructed spectrum (csrvq.py:160-183).

        ``num_streams`` comes from the static codes shape.
        """
        num_streams = codes.shape[1]
        dims = 4 if self.backbone == "convolution" else 3
        z0 = quantizers[0].decode(codes[:, 0], dims)
        if self.backbone == "convolution":
            z0 = _to_nhwc(z0)
        dec = z0
        for i in range(len(self.blocks)):
            if i < num_streams - 1:
                dec = self.csrvq_decode(codes[:, i + 1], dec,
                                        quantizers[i + 1])
            dec, feat_shape = self._run_block(i, dec, feat_shape,
                                              training=False)
        return self._finish(dec, feat_shape, training=False)
