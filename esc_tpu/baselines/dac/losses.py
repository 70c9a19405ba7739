"""DAC training losses (scalar reductions, unlike ESC's per-sample).

Re-design of baselines/descript/dac/nn/loss.py: L1 waveform loss,
multi-scale log-magnitude STFT loss, multi-scale mel loss, SI-SDR —
all on top of the framework's framing+GEMM spectrogram ops.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ...metrics import sisdr
from ...ops.mel import MEL_BINS, MEL_WINDOWS, mel_spectrogram
from ...ops.stft import _dft_matrices, frame_signal

__all__ = ["l1_loss", "multi_scale_stft_loss", "mel_spectrogram_loss",
           "sisdr_loss"]


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute waveform error (loss.py:11-49)."""
    n = min(x.shape[-1], y.shape[-1])
    return jnp.mean(jnp.abs(x[..., :n] - y[..., :n]))


def _mag_stft(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    fwd, _, _ = _dft_matrices(n_fft, n_fft)
    B, L = x.shape
    T = L // hop + 1
    pad = n_fft // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)),
                 mode="reflect")
    frames = frame_signal(xp, n_fft, hop, T)
    spec = jnp.dot(frames, jnp.asarray(fwd),
                   preferred_element_type=jnp.float32)
    spec = spec.reshape(B, T, 2, n_fft // 2 + 1)
    return jnp.sqrt(jnp.sum(spec * spec, axis=2) + 1e-24)


def multi_scale_stft_loss(x: jnp.ndarray, y: jnp.ndarray,
                          window_lengths: Sequence[int] = (2048, 512),
                          clamp_eps: float = 1e-5,
                          mag_weight: float = 1.0,
                          log_weight: float = 1.0) -> jnp.ndarray:
    """Multi-window magnitude + log-magnitude L1 (loss.py:142-229)."""
    n = min(x.shape[-1], y.shape[-1])
    x, y = x[..., :n], y[..., :n]
    loss = 0.0
    for w in window_lengths:
        xm = _mag_stft(x, w, w // 4)
        ym = _mag_stft(y, w, w // 4)
        lx = jnp.log10(jnp.clip(xm, min=clamp_eps) ** 2)
        ly = jnp.log10(jnp.clip(ym, min=clamp_eps) ** 2)
        loss += log_weight * jnp.mean(jnp.abs(lx - ly))
        loss += mag_weight * jnp.mean(jnp.abs(xm - ym))
    return loss


def mel_spectrogram_loss(x: jnp.ndarray, y: jnp.ndarray,
                         sample_rate: int = 16000,
                         window_lengths: Sequence[int] = tuple(MEL_WINDOWS),
                         n_mels: Sequence[int] = tuple(MEL_BINS),
                         clamp_eps: float = 1e-5,
                         mag_weight: float = 0.0,
                         log_weight: float = 1.0) -> jnp.ndarray:
    """DAC's mel loss with scalar reduction and mag_weight=0 default
    (conf/16khz_dns_9k.yml MelSpectrogramLoss block)."""
    n = min(x.shape[-1], y.shape[-1])
    x, y = x[..., :n], y[..., :n]
    loss = 0.0
    for w, m in zip(window_lengths, n_mels):
        xm = mel_spectrogram(x, w, m, sample_rate)
        ym = mel_spectrogram(y, w, m, sample_rate)
        lx = jnp.log10(jnp.clip(xm, min=clamp_eps) ** 2)
        ly = jnp.log10(jnp.clip(ym, min=clamp_eps) ** 2)
        loss += log_weight * jnp.mean(jnp.abs(lx - ly))
        if mag_weight:
            loss += mag_weight * jnp.mean(jnp.abs(xm - ym))
    return loss


def sisdr_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Negative SI-SDR, scalar (loss.py:51-140)."""
    n = min(x.shape[-1], y.shape[-1])
    return -jnp.mean(sisdr(x[..., :n], y[..., :n]))
