"""Multi-device long-audio inference: DP over time chunks.

The TPU-native answer to SURVEY §5's long-context entry: ESC's Swin
stack has a bounded receptive field along time (4-patch windows,
2-patch shifts), so a long file factorizes into independent chunks
with receptive-field margins. The single-device path
(codecs.py::encode_chunked) streams those chunks serially; this module
spreads them across a ``jax.sharding.Mesh``'s data axis — same codes,
wall-clock divided by the device count, memory still constant per
device. No halo collectives are needed at all: the margin IS the halo,
materialized host-side, which keeps every device step a plain batched
encode/decode (the shape XLA partitions best) instead of a ppermute
pipeline.

Uniform-window scheme: unlike the serial path's edge-clamped margins,
every segment here is the same length W = chunk + 2*margin code
frames, with its START clamped into [0, total - W] (like STFT frames
clamp at signal edges) and the kept center sliced host-side at a
variable offset. Uniform shapes mean ONE compiled program per
(wave, num_streams) regardless of file length; boundary chunks see
true signal (not synthetic zeros) exactly like the serial path.

Usage:
    dp = DataParallel()                       # all local devices
    codes, fs = encode_chunked_dp(model, x, num_streams=6, dp=dp)
    audio = decode_chunked_dp(model, codes, fs, dp=dp)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.host import to_host
from .mesh import DataParallel

__all__ = ["encode_chunked_dp", "decode_chunked_dp"]


def _grid(module, chunk_seconds: float, margin_seconds: float, spc: int):
    """Swin-grid-aligned chunk/margin sizes in code frames
    (same rounding as codecs.py::encode_chunked)."""
    align = max(1, module.window_size // module.overlap)
    chunk = max(align, (int(chunk_seconds * module.sr) // spc)
                // align * align)
    margin = max(align, -(-int(margin_seconds * module.sr) // spc)
                 // align * align)
    return chunk, margin


def _starts(total: int, chunk: int, W: int, align: int):
    """Clamped uniform-window starts + kept-center metadata: for chunk k
    the kept codes are [k*chunk, min((k+1)*chunk, total)). Starts are
    snapped DOWN to the Swin window grid so every chunk sees the same
    shifted-window mask phase as the full-file encode; margin >= align
    guarantees the kept span still fits the window after snapping."""
    metas = []
    for k in range(-(-total // chunk)):
        c0 = k * chunk
        c1 = min(c0 + chunk, total)
        s = min(max(c0 - (W - (c1 - c0)) // 2, 0), total - W)
        s = (s // align) * align
        assert 0 <= c0 - s and (c0 - s) + (c1 - c0) <= W
        metas.append((s, c0 - s, c1 - c0))
    return metas


def encode_chunked_dp(model, x, num_streams: int = 6,
                      dp: Optional[DataParallel] = None,
                      chunk_seconds: float = 10.0,
                      margin_seconds: float = 1.0):
    """Encode a long waveform with chunks sharded over the mesh.

    Returns (codes, feat_shape), same contract as model.encode_chunked.
    With dp=None (or one device) this degrades to a serial uniform-
    window pass — still one compile total, unlike the legacy path's
    per-edge-shape variants.
    """
    model._check_streams(num_streams)
    model._ensure_init()
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[None]
    B = x.shape[0]
    module = model.module
    spc = model._samples_per_code()
    L = x.shape[-1]
    fs_full = model.feat_shape(L)
    total = fs_full[1] // module.overlap
    chunk, margin = _grid(module, chunk_seconds, margin_seconds, spc)
    W = chunk + 2 * margin
    if total <= W:
        return model.encode(x, num_streams)

    need = total * spc
    if need > L:
        x = np.pad(x, ((0, 0), (0, need - L)))

    align = max(1, module.window_size // module.overlap)
    metas = _starts(total, chunk, W, align)
    n_dev = dp.num_devices if dp is not None else 1
    if dp is not None:
        model.variables = dp.replicate(model.variables)

    pieces = [None] * len(metas)
    wave = n_dev
    for w0 in range(0, len(metas), wave):
        group = metas[w0:w0 + wave]
        pad = wave - len(group)
        segs = [x[:, s * spc:(s + W) * spc] for s, _, _ in group]
        segs += [segs[-1]] * pad            # duplicate-fill the tail wave
        batch = np.concatenate(segs, axis=0)      # (wave*B, W*spc)
        xb = dp.shard(batch) if dp is not None else jnp.asarray(batch)
        codes, _ = model.encode(xb, num_streams)
        codes = to_host(codes)               # (wave*B, ns, g, W)
        for i, (s, off, keep) in enumerate(group):
            pieces[w0 + i] = codes[i * B:(i + 1) * B, ...,
                                   off:off + keep]
    out = np.concatenate(pieces, axis=-1)
    return jnp.asarray(out), fs_full


def decode_chunked_dp(model, codes, feat_shape: Tuple[int, int],
                      dp: Optional[DataParallel] = None,
                      chunk_seconds: float = 10.0,
                      margin_seconds: float = 1.0,
                      crossfade: int = 160):
    """Decode long-file codes with chunks sharded over the mesh.

    Same splice contract as model.decode_chunked (short linear
    crossfade at seams, output trimmed/padded to the full-file length).
    """
    model._ensure_init()
    codes = to_host(codes)
    module = model.module
    spc = model._samples_per_code()
    total = codes.shape[-1]
    chunk, margin = _grid(module, chunk_seconds, margin_seconds, spc)
    W = chunk + 2 * margin
    if total <= W:
        return model.decode(jnp.asarray(codes), feat_shape)

    H = feat_shape[0]
    B = codes.shape[0]
    align = max(1, module.window_size // module.overlap)
    metas = _starts(total, chunk, W, align)
    n_dev = dp.num_devices if dp is not None else 1
    if dp is not None:
        model.variables = dp.replicate(model.variables)

    seg_fs = (H, W * module.overlap)
    decoded = [None] * len(metas)
    wave = n_dev
    for w0 in range(0, len(metas), wave):
        group = metas[w0:w0 + wave]
        pad = wave - len(group)
        segs = [codes[..., s:s + W] for s, _, _ in group]
        segs += [segs[-1]] * pad
        batch = np.concatenate(segs, axis=0)       # (wave*B, ns, g, W)
        cb = dp.shard(batch) if dp is not None else jnp.asarray(batch)
        y = to_host(model.decode(cb, seg_fs))      # (wave*B, samples)
        for i in range(len(group)):
            decoded[w0 + i] = y[i * B:(i + 1) * B]

    out = None
    for (s, off, keep), y in zip(metas, decoded):
        kept = y[:, off * spc:(off + keep) * spc].copy()
        if out is None:
            out = kept
        else:
            xf = min(crossfade, kept.shape[-1], out.shape[-1], off * spc)
            if xf > 0:
                prev_tail = y[:, off * spc - xf:off * spc]
                w = np.linspace(0.0, 1.0, xf, dtype=np.float32)[None]
                out[:, -xf:] = out[:, -xf:] * (1 - w) + prev_tail * w
            out = np.concatenate([out, kept], axis=-1)
    expected = (feat_shape[1] * module.patch_size[1] - 1) \
        * int(module.hop_len * module.sr * 1e-3)
    if out.shape[-1] < expected:
        out = np.pad(out, ((0, 0), (0, expected - out.shape[-1])))
    return jnp.asarray(out[:, :expected])
