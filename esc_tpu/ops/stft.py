"""Complex STFT / inverse STFT as framing + GEMM (TPU-native).

Semantics match ``torchaudio.transforms.Spectrogram(power=None)`` /
``InverseSpectrogram`` as used by the reference codec frontend
(reference: esc/models/base.py:22-47):

* n_fft = (in_freq - 1) * 2 (= 382 for F=192 bins)
* win_length = 320 (20 ms @ 16 kHz), hop_length = 80 (5 ms)
* periodic Hann window, zero-padded symmetrically to n_fft
* center=True with reflect padding of n_fft//2 samples on both sides
* one-sided complex output, no normalization

Instead of an FFT (awkward on TPU for odd-radix n_fft=382), the DFT is a
single ``(B*T, n_fft) @ (n_fft, 2F)`` matmul that XLA tiles straight onto
the MXU. Framing is gather-free: the padded signal is reshaped into
hop-sized chunks and frames are assembled from a handful of shifted
slices — no scatters, no strided convolutions, fully fusable.

All trig tables are built in float64 numpy at trace time and baked into
the compiled program as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "frame_signal",
    "overlap_add",
    "stft",
    "istft",
    "spec_transform",
    "audio_reconstruct",
]


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window`` (float64)."""
    n = win_length + 1 if not periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
    return w[:win_length]


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    """Window zero-padded symmetrically to n_fft (torch.stft convention)."""
    w = hann_window(win_length)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[left : left + win_length] = w
    return out


@functools.lru_cache(maxsize=32)
def _dft_matrices(n_fft: int, win_length: int):
    """Forward/inverse DFT matrices with the analysis/synthesis window
    folded in (numpy float32).

    Returns:
      fwd:  (n_fft, 2F) matrix; columns [0:F] give the real part, columns
            [F:2F] the imaginary part of the one-sided DFT of a frame.
      inv:  (2F, n_fft) matrix mapping [real; imag] frame spectra to
            windowed time-domain frames (irfft then synthesis-window
            multiply, as torch.istft does).
      wsq:  (n_fft,) squared synthesis window for the OLA envelope.
    """
    F = n_fft // 2 + 1
    w = _padded_window(n_fft, win_length)
    n = np.arange(n_fft)[None, :]  # (1, n_fft)
    f = np.arange(F)[:, None]      # (F, 1)
    ang = 2.0 * np.pi * f * n / n_fft
    cos, sin = np.cos(ang), np.sin(ang)

    # forward: X[f] = sum_n w[n] x[n] (cos - i sin)
    fwd = np.concatenate([cos * w[None, :], -sin * w[None, :]], axis=0).T

    # inverse: x[n] = (1/n_fft) sum_f c_f (Re X[f] cos - Im X[f] sin),
    # with c_f = 1 for f in {0, Nyquist}, else 2 (one-sided irfft).
    c = np.full((F, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    inv = np.concatenate([c * cos, -c * sin], axis=0) / n_fft  # (2F, n_fft)
    inv = inv * w[None, :]  # fold synthesis window into the matrix

    return fwd.astype(np.float32), inv.astype(np.float32), (w * w).astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int,
                 num_frames: int) -> jnp.ndarray:
    """Gather-free framing: ``(B, L) -> (B, T, frame_length)``.

    Frame t covers ``x[t*hop : t*hop + frame_length]``. The signal is
    reshaped into hop-sized chunks and each frame is a concatenation of
    ``ceil(frame_length/hop)`` consecutive chunks — pure slices that XLA
    fuses, no gathers or strided convs.
    """
    B, L = x.shape
    n_chunks = -(-frame_length // hop_length)
    need = (num_frames + n_chunks) * hop_length
    if need > L:
        x = jnp.pad(x, ((0, 0), (0, need - L)))
    chunks = x[:, : (x.shape[1] // hop_length) * hop_length]
    chunks = chunks.reshape(B, -1, hop_length)
    parts = [chunks[:, k : k + num_frames] for k in range(n_chunks)]
    frames = jnp.concatenate(parts, axis=2)  # (B, T, n_chunks*hop)
    return frames[:, :, :frame_length]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Shift-and-add OLA: ``(B, T, frame_length) -> (B, (T-1)*hop + ceil)``.

    The dual of :func:`frame_signal`: frames are padded to a multiple of
    hop and the k-th hop-chunk of every frame is added at frame-offset k.
    Output length is ``(T + n_chunks - 1) * hop`` (callers trim).
    """
    B, T, FL = frames.shape
    n_chunks = -(-FL // hop_length)
    pad_f = n_chunks * hop_length - FL
    if pad_f:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad_f)))
    frames = frames.reshape(B, T, n_chunks, hop_length)
    total = T + n_chunks - 1
    y = jnp.zeros((B, total, hop_length), dtype=frames.dtype)
    for k in range(n_chunks):
        y = y.at[:, k : k + T].add(frames[:, :, k])
    return y.reshape(B, total * hop_length)


def stft(x: jnp.ndarray, n_fft: int = 382, win_length: int = 320,
         hop_length: int = 80) -> jnp.ndarray:
    """One-sided complex STFT returned as stacked real/imag channels.

    Args:
      x: waveform ``(B, L)``.
    Returns:
      ``(B, 2, F, T)`` with channel 0 = real, 1 = imag, ``F = n_fft//2+1``,
      ``T = L // hop_length + 1``.
    """
    fwd, _, _ = _dft_matrices(n_fft, win_length)
    F = n_fft // 2 + 1
    B, L = x.shape
    T = L // hop_length + 1
    pad = n_fft // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(xp, n_fft, hop_length, T)  # (B, T, n_fft)
    spec = jnp.dot(frames, jnp.asarray(fwd),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (B, T, 2F)
    spec = spec.reshape(B, T, 2, F)
    return spec.transpose(0, 2, 3, 1)  # (B, 2, F, T)


def istft(spec: jnp.ndarray, n_fft: int = 382, win_length: int = 320,
          hop_length: int = 80, length: int | None = None) -> jnp.ndarray:
    """Inverse of :func:`stft` with least-squares OLA normalization.

    Args:
      spec: ``(B, 2, F, T)`` stacked real/imag one-sided spectrum.
    Returns:
      waveform ``(B, L)`` with ``L = (T - 1) * hop_length`` when ``length``
      is None (torch.istft convention for even n_fft, center=True).
    """
    _, inv, wsq = _dft_matrices(n_fft, win_length)
    B, _, F, T = spec.shape
    flat = spec.transpose(0, 3, 1, 2).reshape(B, T, 2 * F)
    frames = jnp.dot(flat.astype(jnp.float32), jnp.asarray(inv),
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (B, T, n_fft)
    y = overlap_add(frames, hop_length)

    # OLA envelope of the squared synthesis window (static numpy).
    n_chunks = -(-n_fft // hop_length)
    env = np.zeros((T + n_chunks - 1) * hop_length, dtype=np.float64)
    wsq_pad = np.concatenate(
        [wsq.astype(np.float64), np.zeros(n_chunks * hop_length - n_fft)])
    for t in range(T):
        env[t * hop_length : t * hop_length + n_chunks * hop_length] += wsq_pad

    pad = n_fft // 2
    out_len = (T - 1) * hop_length if length is None else length
    y = y[:, pad : pad + out_len]
    env = env[pad : pad + out_len]
    env = np.where(env > 1e-11, env, 1.0).astype(np.float32)
    return y / jnp.asarray(env)


def spec_transform(x: jnp.ndarray, in_freq: int = 192, win_len: int = 20,
                   hop_len: int = 5, sr: int = 16000) -> jnp.ndarray:
    """Waveform -> complex STFT feature ``(B, 2, F, T)``.

    Mirrors ``BaseAudioCodec.spec_transform`` (reference:
    esc/models/base.py:29-37): n_fft = (in_freq-1)*2, win/hop given in ms.
    """
    return stft(x, n_fft=(in_freq - 1) * 2,
                win_length=int(win_len * sr * 1e-3),
                hop_length=int(hop_len * sr * 1e-3))


def audio_reconstruct(feat: jnp.ndarray, in_freq: int = 192, win_len: int = 20,
                      hop_len: int = 5, sr: int = 16000,
                      length: int | None = None) -> jnp.ndarray:
    """Complex STFT feature ``(B, 2, F, T)`` -> waveform ``(B, L)``.

    Mirrors ``BaseAudioCodec.audio_reconstruct`` (reference:
    esc/models/base.py:39-47).
    """
    return istft(feat, n_fft=(in_freq - 1) * 2,
                 win_length=int(win_len * sr * 1e-3),
                 hop_length=int(hop_len * sr * 1e-3), length=length)
