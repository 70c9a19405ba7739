"""Codec facades: ESC (cross-scale product VQ) and RVQCodecs (ablation).

Re-design of esc/models/codecs.py. Each codec is a flax module
(`ESCModule` / `RVQModule`) plus a stateful convenience wrapper
(`ESC` / `RVQCodecs`) that owns the variables and jit caches, so user
code reads like the reference:

    model = ESC(**config)            # lazy-init params
    codes, shape = model.encode(x, num_streams=6)
    recon = model.decode(codes, shape)

``num_streams`` is always a static Python int — at most six compiled
variants per entry point, cached by jax.jit.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..modules.vq import ProductResidualVectorQuantize, ProductVectorQuantize
from ..ops.stft import audio_reconstruct, spec_transform
from ..utils.host import to_host
from .base import Decoder, Encoder
from .csrvq import CrossScaleRVQDecoder

__all__ = ["ESCModule", "RVQModule", "ESC", "RVQCodecs", "model_dict",
           "make_model"]


def _prec_scope(name: Optional[str]):
    """Trace-time matmul-precision scope; explicit per-op precisions
    (VQ distance, STFT GEMMs) are unaffected."""
    return (jax.default_matmul_precision(name) if name
            else contextlib.nullcontext())


class ESCModule(nn.Module):
    """Efficient Speech Codec as a flax module (esc/models/codecs.py:9-94)."""

    in_dim: int = 2
    in_freq: int = 192
    h_dims: Sequence[int] = (45, 72, 96, 144, 192, 384)
    max_streams: int = 6
    win_len: int = 20
    hop_len: int = 5
    sr: int = 16000
    patch_size: Sequence[int] = (3, 2)
    swin_heads: Sequence[int] = (3, 6, 12, 24, 24)
    swin_depth: int = 2
    window_size: int = 4
    mlp_ratio: float = 4.0
    overlap: int = 2
    group_size: int = 3
    codebook_size: int = 1024
    codebook_dims: Sequence[int] = (8, 8, 8, 8, 8, 8)
    l2norm: bool = True
    backbone: str = "transformer"
    kernel_size: Sequence[int] = (5, 2)
    conv_depth: int = 1
    dtype: Any = jnp.float32
    # Per-submodule matmul precision override (None = inherit the global
    # jax_default_matmul_precision, which esc_tpu pins to "highest").
    # Round-3 A/B showed flipping the GLOBAL default to MXU-native
    # regresses quality (tests/golden/precision_arms.json) even though
    # the loss-STFT and VQ-distance GEMMs carry explicit HIGHEST — the
    # sensitivity lives in the model bulk. These knobs scope the
    # experiment: e.g. enc_precision="default" keeps decoder gradients
    # fp32 while the encoder rides the fast MXU path. Explicit
    # per-op precisions (VQ distance, STFT GEMMs) always win over this
    # scope, so parity-critical ops stay fp32 regardless.
    enc_precision: Optional[str] = None
    dec_precision: Optional[str] = None

    def setup(self):
        h = list(self.h_dims)
        dec_h = h[::-1]
        H = self.in_freq // self.patch_size[0]
        # Per-scale product VQs (reference init_ProductVQs, base.py:49-71).
        qs = [ProductVectorQuantize(
            in_dim=dec_h[0], in_freq=H // 2 ** (self.max_streams - 1),
            overlap=self.overlap, num_vqs=self.group_size,
            codebook_dim=self.codebook_dims[0],
            codebook_size=self.codebook_size, l2norm=self.l2norm,
            name="quantizers_0")]
        for i in range(1, self.max_streams):
            qs.append(ProductVectorQuantize(
                in_dim=dec_h[i - 1],
                in_freq=H // 2 ** (self.max_streams - i),
                overlap=self.overlap, num_vqs=self.group_size,
                codebook_dim=self.codebook_dims[i],
                codebook_size=self.codebook_size, l2norm=self.l2norm,
                name=f"quantizers_{i}"))
        self.quantizers = qs
        self.encoder = Encoder(self.backbone, self.in_freq, self.in_dim,
                               tuple(self.h_dims), tuple(self.patch_size),
                               tuple(self.kernel_size), self.conv_depth,
                               tuple(self.swin_heads), self.swin_depth,
                               self.window_size, self.mlp_ratio,
                               dtype=self.dtype)
        self.decoder = CrossScaleRVQDecoder(
            backbone=self.backbone, in_freq=self.in_freq, in_dim=self.in_dim,
            h_dims=tuple(dec_h), patch_size=tuple(self.patch_size),
            kernel_size=tuple(self.kernel_size), conv_depth=self.conv_depth,
            swin_heads=tuple(self.swin_heads[::-1]),
            swin_depth=self.swin_depth, window_size=self.window_size,
            mlp_ratio=self.mlp_ratio, dtype=self.dtype)

    @property
    def max_bps(self) -> float:
        return (2 / self.overlap) * self.max_streams \
            * math.log2(self.codebook_size) * self.group_size \
            // (20 * self.patch_size[1] // 2)

    def __call__(self, x, x_feat=None, num_streams: int = 6,
                 freeze_codebook: bool = False, training: bool = False):
        """Full forward (esc/models/codecs.py:30-66). Returns the reference
        output dict with per-sample ``(B,)`` losses."""
        if freeze_codebook:
            num_streams = self.max_streams
        if x_feat is None:
            x_feat = spec_transform(x, self.in_freq, self.win_len,
                                    self.hop_len, self.sr)
        else:
            x_feat = x_feat.transpose(0, 3, 1, 2)  # (B,F,T,2) -> (B,2,F,T)
        with _prec_scope(self.enc_precision):
            enc_hs, feat_shape = self.encoder(x_feat, training=training)
        with _prec_scope(self.dec_precision):
            recon_feat, codes, cm_loss, cb_loss = self.decoder(
                enc_hs, num_streams, self.quantizers, feat_shape,
                freeze_vq=freeze_codebook, training=training)
        recon_x = audio_reconstruct(recon_feat, self.in_freq, self.win_len,
                                    self.hop_len, self.sr)
        return {"cm_loss": cm_loss, "cb_loss": cb_loss,
                "raw_audio": x, "recon_audio": recon_x,
                "raw_feat": x_feat, "recon_feat": recon_feat,
                "codes": codes}

    def encode(self, x, num_streams: int = 6):
        """Waveform -> multi-scale codes (esc/models/codecs.py:68-81)."""
        x_feat = spec_transform(x, self.in_freq, self.win_len, self.hop_len,
                                self.sr)
        with _prec_scope(self.enc_precision):
            enc_hs, feat_shape = self.encoder(x_feat, training=False)
        with _prec_scope(self.dec_precision):
            return self.decoder.encode(enc_hs, num_streams, self.quantizers,
                                       feat_shape)

    def decode(self, codes, feat_shape: Tuple[int, int]):
        """Codes -> waveform (esc/models/codecs.py:83-94)."""
        with _prec_scope(self.dec_precision):
            recon_feat = self.decoder.decode(codes, self.quantizers,
                                             feat_shape)
        return audio_reconstruct(recon_feat, self.in_freq, self.win_len,
                                 self.hop_len, self.sr)


class RVQModule(nn.Module):
    """Bottleneck product-residual VQ codec (esc/models/codecs.py:96-181)."""

    in_dim: int = 2
    in_freq: int = 192
    h_dims: Sequence[int] = (45, 72, 96, 144, 192, 384)
    max_streams: int = 6
    backbone: str = "transformer"
    kernel_size: Sequence[int] = (5, 2)
    conv_depth: int = 1
    patch_size: Sequence[int] = (3, 2)
    swin_heads: Sequence[int] = (3, 6, 12, 24, 24)
    swin_depth: int = 2
    window_size: int = 4
    mlp_ratio: float = 4.0
    overlap: int = 2
    num_rvqs: int = 6
    group_size: int = 3
    codebook_dim: int = 8
    codebook_size: int = 1024
    l2norm: bool = True
    win_len: int = 20
    hop_len: int = 5
    sr: int = 16000
    dtype: Any = jnp.float32

    def setup(self):
        h = list(self.h_dims)
        dec_h = h[::-1]
        H = self.in_freq // self.patch_size[0]
        self.quantizers = ProductResidualVectorQuantize(
            in_dim=dec_h[0], in_freq=H // 2 ** (self.max_streams - 1),
            overlap=self.overlap, num_pvqs=self.group_size,
            num_rvqs=self.num_rvqs, codebook_dim=self.codebook_dim,
            codebook_size=self.codebook_size, l2norm=self.l2norm)
        self.encoder = Encoder(self.backbone, self.in_freq, self.in_dim,
                               tuple(h), tuple(self.patch_size),
                               tuple(self.kernel_size), self.conv_depth,
                               tuple(self.swin_heads), self.swin_depth,
                               self.window_size, self.mlp_ratio,
                               dtype=self.dtype)
        self.decoder = Decoder(self.backbone, self.in_freq, self.in_dim,
                               tuple(dec_h), tuple(self.patch_size),
                               tuple(self.kernel_size), self.conv_depth,
                               tuple(self.swin_heads[::-1]), self.swin_depth,
                               self.window_size, self.mlp_ratio,
                               dtype=self.dtype)

    @property
    def max_bps(self) -> float:
        return (2 / self.overlap) * self.max_streams \
            * math.log2(self.codebook_size) * self.group_size \
            // (20 * self.patch_size[1] // 2)

    def _nchw(self, x):
        return x.transpose(0, 3, 1, 2) if self.backbone == "convolution" \
            else x

    def __call__(self, x, x_feat=None, num_streams: int = 6,
                 freeze_codebook: bool = False, training: bool = False):
        if x_feat is None:
            x_feat = spec_transform(x, self.in_freq, self.win_len,
                                    self.hop_len, self.sr)
        else:
            x_feat = x_feat.transpose(0, 3, 1, 2)
        enc_hs, feat_shape = self.encoder(x_feat, training=training)
        out = self.quantizers(self._nchw(enc_hs[-1]), num_streams,
                              freeze_vq=freeze_codebook, training=training)
        z_q = out["z_q"]
        if self.backbone == "convolution":
            z_q = z_q.transpose(0, 2, 3, 1)
        recon_feat = self.decoder(z_q, feat_shape, training=training)
        recon_x = audio_reconstruct(recon_feat, self.in_freq, self.win_len,
                                    self.hop_len, self.sr)
        return {"cm_loss": out["cm_loss"], "cb_loss": out["cb_loss"],
                "raw_audio": x, "recon_audio": recon_x,
                "raw_feat": x_feat, "recon_feat": recon_feat,
                "codes": out["codes"]}

    def encode(self, x, num_streams: int = 6):
        x_feat = spec_transform(x, self.in_freq, self.win_len, self.hop_len,
                                self.sr)
        enc_hs, _ = self.encoder(x_feat, training=False)
        return self.quantizers.encode(self._nchw(enc_hs[-1]), num_streams)

    def decode(self, codes, feat_shape: Tuple[int, int]):
        dims = 4 if self.backbone == "convolution" else 3
        z_q = self.quantizers.decode(codes, dims)
        if self.backbone == "convolution":
            z_q = z_q.transpose(0, 2, 3, 1)
        recon_feat = self.decoder(z_q, feat_shape, training=False)
        return audio_reconstruct(recon_feat, self.in_freq, self.win_len,
                                 self.hop_len, self.sr)


# Module-level jitted entry points with the (hashable, frozen) flax
# module as a static argument: every codec instance with an identical
# config shares one compiled program per entry point, instead of
# re-tracing per wrapper instance.
@functools.partial(jax.jit, static_argnames=("mod",))
def _init_jit(mod, rng, x):
    return mod.init(rng, x, None, mod.max_streams, False, False)


@functools.partial(jax.jit, static_argnames=("mod", "num_streams"))
def _encode_jit(mod, variables, x, num_streams):
    return mod.apply(variables, x, num_streams, method="encode")


@functools.partial(jax.jit, static_argnames=("mod", "feat_shape"))
def _decode_jit(mod, variables, codes, feat_shape):
    return mod.apply(variables, codes, feat_shape, method="decode")


@functools.partial(jax.jit,
                   static_argnames=("mod", "num_streams", "freeze_codebook"))
def _forward_jit(mod, variables, x, x_feat, num_streams, freeze_codebook):
    return mod.apply(variables, x, x_feat, num_streams, freeze_codebook,
                     False)


@functools.partial(jax.jit,
                   static_argnames=("mod", "num_streams", "feat_shape"))
def _roundtrip_jit(mod, variables, x, num_streams, feat_shape):
    codes = mod.apply(variables, x, num_streams, method="encode")
    recon = mod.apply(variables, codes, feat_shape, method="decode")
    return codes, recon


class _CodecWrapper:
    """Stateful convenience facade around a codec flax module.

    Owns the variables, lazily initialized; the jitted entry points are
    shared across instances with equal configs (see the module-level
    *_jit functions).
    """

    module_cls = None

    def __init__(self, seed: int = 0, dtype: Any = jnp.float32, **config):
        config = dict(config)
        config.pop("dtype", None)
        self.config = config
        # tuple-ize sequence fields so the module is hashable (frozen
        # dataclass) and can be a jit static argument
        module_cfg = {k: tuple(v) if isinstance(v, list) else v
                      for k, v in config.items()}
        self.module = self.module_cls(**module_cfg, dtype=dtype)
        self.variables = None
        self._seed = seed

        mod = self.module
        self._encode_fn = functools.partial(_encode_jit, mod)
        self._decode_fn = functools.partial(_decode_jit, mod)
        self._forward_fn = functools.partial(_forward_jit, mod)
        self._roundtrip_fn = functools.partial(_roundtrip_jit, mod)
        if dtype == jnp.bfloat16:
            # bf16 serving mode: trace under DEFAULT matmul precision so
            # bf16 dots hit the MXU natively (fp32 accumulate). The
            # package-wide `highest` default would instead request
            # multi-pass emulation on bf16 inputs — measured ~1.3x
            # slower with no quality benefit (the mode already trades
            # bit-parity; quality-neutrality is asserted on trained
            # weights in tests/golden/bf16_quality.json).
            def _default_prec(fn):
                @functools.wraps(fn)
                def wrapped(*a, **k):
                    with jax.default_matmul_precision("default"):
                        return fn(*a, **k)
                return wrapped

            self._encode_fn = _default_prec(self._encode_fn)
            self._decode_fn = _default_prec(self._decode_fn)
            self._forward_fn = _default_prec(self._forward_fn)
            self._roundtrip_fn = _default_prec(self._roundtrip_fn)

    # -- variables ------------------------------------------------------

    @property
    def max_streams(self) -> int:
        return self.module.max_streams

    @property
    def max_bps(self) -> float:
        return self.module.max_bps

    def init_params(self, seed: int | None = None, example_len: int = 47920):
        rng = jax.random.PRNGKey(self._seed if seed is None else seed)
        x = jnp.zeros((1, example_len), jnp.float32)
        # jit the initializer: eager init dispatches hundreds of tiny ops
        # (minutes through a remote-TPU tunnel); compiled it is one
        # program, shared across wrapper instances with equal configs
        # (the frozen module is the cache key), and it lands in the
        # persistent compilation cache.
        self.variables = _init_jit(self.module, rng, x)
        return self.variables

    def _ensure_init(self):
        if self.variables is None:
            self.init_params()

    def num_params(self) -> int:
        if self.variables is None:
            # abstract init: trace-only shape inference, no XLA compile —
            # param counting stays cheap even for ESC-Large
            shapes = jax.eval_shape(
                lambda rng, x: self.module.init(
                    rng, x, None, self.module.max_streams, False, False),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, 4720), jnp.float32))
            leaves = jax.tree_util.tree_leaves(shapes["params"])
        else:
            leaves = jax.tree_util.tree_leaves(self.variables["params"])
        return int(sum(np.prod(l.shape) for l in leaves))

    def feat_shape(self, audio_len: int) -> Tuple[int, int]:
        """Bottom-scale feature shape for a given audio length (static)."""
        m = self.module
        hop = int(m.hop_len * m.sr * 1e-3)
        T = audio_len // hop + 1
        H = m.in_freq // m.patch_size[0]
        W = T // m.patch_size[1]
        if m.backbone == "convolution":
            for _ in range(m.max_streams - 1):
                H = H // 2
        else:
            for _ in range(m.max_streams - 1):
                H = (H + 1) // 2
        return (H, W)

    # -- reference-facing API -------------------------------------------

    def _check_streams(self, num_streams: int):
        if not 1 <= num_streams <= self.max_streams:
            raise ValueError(
                f"num_streams must be in 1..{self.max_streams} "
                f"(got {num_streams}); bitrate = num_streams * 1.5 kbps")

    def __call__(self, x, x_feat=None, num_streams: int = 6,
                 freeze_codebook: bool = False):
        """Eval-mode forward returning the reference output dict."""
        self._check_streams(num_streams)
        self._ensure_init()
        return self._forward_fn(self.variables, jnp.asarray(x), x_feat,
                                num_streams, freeze_codebook)

    forward = __call__

    def encode(self, x, num_streams: int = 6):
        """Waveform -> (codes, feat_shape)."""
        self._check_streams(num_streams)
        self._ensure_init()
        x = jnp.asarray(x)
        codes = self._encode_fn(self.variables, x, num_streams)
        return codes, self.feat_shape(x.shape[-1])

    def decode(self, codes, feat_shape: Tuple[int, int]):
        """(codes, feat_shape) -> waveform."""
        self._ensure_init()
        return self._decode_fn(self.variables, jnp.asarray(codes),
                               tuple(feat_shape))

    # -- chunked long-file inference (constant memory) --------------------

    def pad_length(self, n: int) -> int:
        """Smallest grid-exact input length >= n (recon covers exactly it)."""
        m = self.module
        hop = int(m.hop_len * m.sr * 1e-3)
        from ..train.data import esc_pad_length
        return esc_pad_length(n, hop, m.patch_size[1])

    def _samples_per_code(self) -> int:
        m = self.module
        hop = int(m.hop_len * m.sr * 1e-3)
        return hop * m.patch_size[1] * m.overlap  # 320 for the base config

    def encode_chunked(self, x, num_streams: int = 6,
                       chunk_seconds: float = 10.0,
                       margin_seconds: float = 1.0):
        """Windowed constant-memory encoding for long files.

        The Swin stack's receptive field along time is bounded (4-patch
        windows with 2-patch shifts per block), so each chunk is encoded
        with a ``margin`` of context on both sides and only the center
        codes are kept. Codes match full-file encoding except within a
        receptive field of the chunk seams. Returns (codes, feat_shape
        of the full signal). Capability extension: the reference only has
        chunked inference for DAC (baselines/.../base.py:188-216).
        """
        self._check_streams(num_streams)
        self._ensure_init()
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None]
        spc = self._samples_per_code()
        L = x.shape[-1]
        fs_full = self.feat_shape(L)
        total_codes = fs_full[1] // self.module.overlap
        # chunk starts and margins must keep the Swin window grid aligned:
        # window_size tokens = window_size/overlap code frames (2 for the
        # base config), so round both to even code counts
        align = max(1, self.module.window_size // self.module.overlap)
        chunk = max(align, (int(chunk_seconds * self.module.sr) // spc)
                    // align * align)
        margin = max(align, -(-int(margin_seconds * self.module.sr)
                              // spc) // align * align)
        if total_codes <= chunk:
            codes, fs = self.encode(x, num_streams)
            return codes, fs

        # the trailing center-padded STFT frame makes full-file coverage
        # total_codes*spc samples; zero-fill the tail
        need = total_codes * spc
        if need > L:
            x = np.pad(x, ((0, 0), (0, need - L)))

        metas, segs = [], []
        for start in range(0, total_codes, chunk):
            end = min(start + chunk, total_codes)
            lo = max(0, start - margin)
            hi = min(total_codes, end + margin)
            metas.append((start, lo, end))
            segs.append(x[:, lo * spc : hi * spc])
        # pipelined: chunk i+1's H2D + encode overlaps chunk i's D2H
        # (esc_tpu.serving.stream_map with 2 chunks in flight)
        from ..serving import stream_map
        pieces = [
            c[..., start - lo : start - lo + (end - start)]
            for (start, lo, end), c in zip(
                metas, stream_map(
                    lambda s: self.encode(s, num_streams)[0], segs,
                    depth=2))]
        codes = np.concatenate(pieces, axis=-1)
        return jnp.asarray(codes), fs_full

    def decode_chunked(self, codes, feat_shape: Tuple[int, int],
                       chunk_seconds: float = 10.0,
                       margin_seconds: float = 1.0,
                       crossfade: int = 160):
        """Windowed decoding, the inverse of :meth:`encode_chunked`.

        Chunks are decoded with margins and spliced with a short linear
        crossfade, so memory stays constant in file length.
        """
        self._ensure_init()
        codes = to_host(codes)
        spc = self._samples_per_code()
        total_codes = codes.shape[-1]
        align = max(1, self.module.window_size // self.module.overlap)
        chunk = max(align, (int(chunk_seconds * self.module.sr) // spc)
                    // align * align)
        margin = max(align, -(-int(margin_seconds * self.module.sr)
                              // spc) // align * align)
        if total_codes <= chunk:
            return self.decode(codes, feat_shape)

        H = feat_shape[0]
        metas = []
        for start in range(0, total_codes, chunk):
            end = min(start + chunk, total_codes)
            lo = max(0, start - margin)
            hi = min(total_codes, end + margin)
            metas.append((start, lo, hi, end))

        def _dec(meta):
            start, lo, hi, end = meta
            seg_fs = (H, (hi - lo) * self.module.overlap)
            return self.decode(jnp.asarray(codes[..., lo:hi]), seg_fs)

        from ..serving import stream_map
        out = None
        for (start, lo, hi, end), y in zip(
                metas, stream_map(_dec, metas, depth=2)):
            keep = y[:, (start - lo) * spc
                     : (start - lo + end - start) * spc].copy()
            if out is None:
                out = keep
            else:
                xf = min(crossfade, keep.shape[-1], out.shape[-1])
                if xf > 0:
                    # crossfade the seam using the margin-decoded preview
                    # of the previous region
                    prev_tail = y[:, (start - lo) * spc - xf
                                  : (start - lo) * spc]
                    w = np.linspace(0.0, 1.0, xf, dtype=np.float32)[None]
                    out[:, -xf:] = out[:, -xf:] * (1 - w) + prev_tail * w
                out = np.concatenate([out, keep], axis=-1)
        # full-file decode yields (T-1)*hop samples; the last chunk's
        # decode is one STFT frame short of its code coverage — pad
        expected = (feat_shape[1] * self.module.patch_size[1] - 1) \
            * int(self.module.hop_len * self.module.sr * 1e-3)
        if out.shape[-1] < expected:
            out = np.pad(out, ((0, 0), (0, expected - out.shape[-1])))
        return jnp.asarray(out[:, :expected])

    def roundtrip(self, x, num_streams: int = 6):
        """Waveform -> (codes, feat_shape, reconstruction) in ONE device
        dispatch — encode+decode fused into a single compiled program
        (halves the host-dispatch overhead of calling them separately)."""
        self._check_streams(num_streams)
        self._ensure_init()
        x = jnp.asarray(x)
        fs = self.feat_shape(x.shape[-1])
        codes, recon = self._roundtrip_fn(self.variables, x, num_streams,
                                          fs)
        return codes, fs, recon

    def print_codec(self):
        """Mirror of BaseAudioCodec.print_codec (esc/models/base.py:86-107)."""
        m = self.module
        if isinstance(self, RVQCodecs):
            q = m.quantizers
            print("Codec Visualization [only at bottom]")
            print("     Freq dim:                ", q.in_freq)
            print("     Channel(hidden) dim:     ", q.in_dim)
            print("     Reshaped hidden dim:     ", q.fix_dim)
            print("     Codebook dim:            ", q.codebook_dim)
            return
        H = m.in_freq // m.patch_size[0]
        dec_h = list(m.h_dims)[::-1]
        freqs = [H // 2 ** (m.max_streams - 1)] + \
            [H // 2 ** (m.max_streams - i) for i in range(1, m.max_streams)]
        dims = [dec_h[0]] + [dec_h[i - 1] for i in range(1, m.max_streams)]
        print("Codec Visualization [from bottom to top]: ")
        print("     Freq dims:                ", freqs)
        print("     Channel(hidden) dims:     ", dims)
        print("     Reshaped hidden dims:     ", [f * d for f, d in zip(freqs, dims)])
        print("     Codebook dims:            ", list(m.codebook_dims))


class ESC(_CodecWrapper):
    """Efficient Speech Codec (reference ESC, esc/models/codecs.py:9)."""

    module_cls = ESCModule


class RVQCodecs(_CodecWrapper):
    """RVQ ablation codec (reference RVQCodecs, esc/models/codecs.py:96)."""

    module_cls = RVQModule


model_dict = {
    "csvq+conv": ESC,
    "csvq+swinT": ESC,
    "rvq+conv": RVQCodecs,
    "rvq+swinT": RVQCodecs,
}


def make_model(model_config, model_name: str = "csvq+swinT",
               seed: int = 0, dtype: Any = jnp.float32):
    """Build a codec from a config dict/namespace (esc/models/codecs.py:190).

    Unlike the reference (whose invalid-name check is a no-op bare string,
    codecs.py:191-192), unknown names raise. ``model_name`` defaults to
    ``csvq+swinT`` so `scripts.compress`-style configs without a name work
    (the reference CLI omits it and would TypeError, compress.py:22).
    """
    if model_name not in model_dict:
        raise ValueError(
            f"{model_name!r} is not valid within "
            f"[csvq+conv, csvq+swinT, rvq+conv, rvq+swinT]")
    cfg = model_config if isinstance(model_config, dict) \
        else vars(model_config)
    cfg = _normalize_config(dict(cfg), model_name)
    return model_dict[model_name](seed=seed, dtype=dtype, **cfg)


def _normalize_config(cfg: dict, model_name: str) -> dict:
    """Fix reference config quirks (SURVEY §7): ablation YAMLs mix up
    ``codebook_dim``/``codebook_dims`` between the two model families."""
    if model_name.startswith("csvq"):
        if "codebook_dim" in cfg and "codebook_dims" not in cfg:
            d = cfg.pop("codebook_dim")
            n = cfg.get("max_streams", 6)
            cfg["codebook_dims"] = [d] * n if isinstance(d, int) else list(d)
        cfg.pop("num_rvqs", None)
    else:
        if "codebook_dims" in cfg and "codebook_dim" not in cfg:
            d = cfg.pop("codebook_dims")
            cfg["codebook_dim"] = d[0] if isinstance(d, (list, tuple)) else d
        elif isinstance(cfg.get("codebook_dim"), (list, tuple)):
            cfg["codebook_dim"] = cfg["codebook_dim"][0]
    return cfg
