"""Windowed-sinc polyphase resampling as one XLA conv.

tpu-native equivalent of the julius/torchaudio resampling the reference
stack leans on (audiotools ``signal.resample`` inside
baselines/descript/dac/compare/encodec.py and the MSD discriminator's
input pyramid). Instead of a per-phase Python loop, the rational-rate
resampler is expressed as a single ``lax.conv_general_dilated`` with
``lhs_dilation=up`` (zero-stuffing) and ``window_strides=down`` — XLA
lowers that to the polyphase form, and the whole thing is one fused op
on device.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample", "resample_kernel", "resample_julius",
           "julius_kernel"]


@functools.lru_cache(maxsize=None)
def resample_kernel(up: int, down: int, zeros: int = 24,
                    rolloff: float = 0.945) -> np.ndarray:
    """Lowpass windowed-sinc for rational resampling by up/down.

    Cutoff sits at ``rolloff`` x the tighter Nyquist (anti-alias when
    decimating, anti-image when interpolating), Hann-windowed with
    ``zeros`` zero-crossings per side, unit DC gain after the ``up``
    amplitude correction.
    """
    fc = rolloff * 0.5 / max(up, down)     # cycles/sample @ rate*up
    half = int(math.ceil(zeros * max(up, down) / rolloff))
    t = np.arange(-half, half + 1, dtype=np.float64)
    h = 2.0 * fc * np.sinc(2.0 * fc * t)
    h *= np.hanning(2 * half + 1 + 2)[1:-1]  # open-ended Hann
    # unit DC gain, then x`up` to undo the zero-stuffing amplitude loss
    h *= up / np.sum(h)
    return h.astype(np.float32)


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int,
             zeros: int = 24, rolloff: float = 0.945) -> jnp.ndarray:
    """Resample (B, L) or (L,) from orig_sr to new_sr.

    Output length is ``ceil(L * new_sr / orig_sr)``.
    """
    if orig_sr == new_sr:
        return x
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    g = math.gcd(int(orig_sr), int(new_sr))
    up, down = new_sr // g, orig_sr // g

    h = jnp.asarray(resample_kernel(up, down, zeros, rolloff))
    half = (h.shape[0] - 1) // 2
    B, L = x.shape
    out_len = -(-L * up // down)

    y = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),       # (B, C=1, L)
        h[None, None, :],                         # (O=1, I=1, K)
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :out_len]
    if squeeze:
        y = y[0]
    return y


@functools.lru_cache(maxsize=None)
def julius_kernel(old_sr: int, new_sr: int, zeros: int = 24,
                  rolloff: float = 0.945) -> np.ndarray:
    """julius.ResampleFrac's phase-kernel bank, bit-faithful.

    audiotools' ``AudioSignal.resample`` (used by the reference MSD,
    esc/models/discriminator.py:87-89) delegates to julius: a clamped
    sinc with a cos^2 window, one kernel row per output phase. Inputs
    must already be gcd-reduced. Returns ``(new_sr, 2*width + old_sr)``
    float32 rows; ``width = ceil(zeros * old_sr / (rolloff * min(sr)))``.
    """
    sr = rolloff * min(old_sr, new_sr)
    width = int(math.ceil(zeros * old_sr / sr))
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    rows = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros) * np.pi
        window = np.cos(t / zeros / 2) ** 2
        rows.append(np.sinc(t / np.pi) * window)
    scale = sr / old_sr
    return (np.stack(rows) * scale).astype(np.float32)


def resample_julius(x: jnp.ndarray, orig_sr: int, new_sr: int,
                    zeros: int = 24, rolloff: float = 0.945) -> jnp.ndarray:
    """Resample (B, L) or (L,) with julius/audiotools-exact semantics:
    replicate edge padding and floor output length
    ``int(L * new_sr / orig_sr)`` (julius.core.ResampleFrac.forward).

    One grouped conv with ``stride=old_sr`` over the phase bank — XLA
    maps it onto the MXU; the per-phase outputs interleave by reshape.
    """
    if orig_sr == new_sr:
        return x
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    g = math.gcd(int(orig_sr), int(new_sr))
    old, new = orig_sr // g, new_sr // g
    k = julius_kernel(old, new, zeros, rolloff)
    width = (k.shape[1] - old) // 2
    B, L = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (width, width + old)),
                 mode="edge")
    ys = jax.lax.conv_general_dilated(
        xp[:, None, :],                       # (B, C=1, L')
        jnp.asarray(k)[:, None, :],           # (O=new, I=1, K)
        window_strides=(old,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )                                         # (B, new, T)
    y = ys.transpose(0, 2, 1).reshape(B, -1)  # interleave phases
    out_len = int(L * new / old)
    y = y[:, :out_len]
    if squeeze:
        y = y[0]
    return y
