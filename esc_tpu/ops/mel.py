"""Mel spectrograms matching ``torchaudio.transforms.MelSpectrogram``.

Used by the multi-scale mel loss and the Mel-Distance metric (reference:
esc/modules/loss/generator_loss.py:37-75, scripts/metrics.py:96-121).
torchaudio defaults replicated: HTK mel scale, norm=None, f_min=0,
f_max=sr/2, power=1 (magnitude), center=True reflect padding, periodic
Hann window, win_length=n_fft, hop=win//4.

The magnitude STFT reuses the framing + DFT-as-GEMM machinery from
:mod:`esc_tpu.ops.stft` so the whole mel bank evaluation is a couple of
MXU matmuls per scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import _dft_matrices, frame_signal

__all__ = ["mel_filterbank", "mel_spectrogram", "MEL_WINDOWS", "MEL_BINS"]

# Multi-scale mel settings (reference: esc/modules/loss/generator_loss.py:7-8)
MEL_WINDOWS = [32, 64, 128, 256, 512, 1024, 2048]
MEL_BINS = [5, 10, 20, 40, 80, 160, 320]


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int = 16000,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """Triangular HTK mel filterbank, ``(n_freqs, n_mels)`` float32.

    Matches ``torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale="htk")``.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(x: jnp.ndarray, n_fft: int, n_mels: int,
                    sample_rate: int = 16000,
                    hop_length: int | None = None) -> jnp.ndarray:
    """Power-1 (magnitude) mel spectrogram of waveform ``(B, L)``.

    Returns ``(B, n_mels, T)`` with ``T = L // hop + 1``.
    """
    hop = hop_length if hop_length is not None else n_fft // 4
    fwd, _, _ = _dft_matrices(n_fft, n_fft)
    F = n_fft // 2 + 1
    B, L = x.shape
    T = L // hop + 1
    pad = n_fft // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(xp, n_fft, hop, T)            # (B, T, n_fft)
    spec = jnp.dot(frames, jnp.asarray(fwd),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (B, T, 2F)
    spec = spec.reshape(B, T, 2, F)
    mag = jnp.sqrt(jnp.sum(spec * spec, axis=2) + 1e-24)  # (B, T, F)
    fb = jnp.asarray(mel_filterbank(F, n_mels, sample_rate))
    return jnp.einsum("btf,fm->bmt", mag, fb,
                      preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
