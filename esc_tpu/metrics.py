"""Evaluation metrics: PESQ (host C lib, gated), Mel distance, SI-SDR,
codebook-entropy / bitrate-utilization counter.

Mirrors scripts/metrics.py. Mel distance and SI-SDR are jitted JAX
functions vmapped over the batch; PESQ is host-side — the ``pesq`` C
library when installed (exact comparability with published numbers),
falling back to the in-repo NumPy P.862.2 model (metrics_pesq.py)
otherwise. PESQ_BACKEND records which one is active.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.mel import MEL_BINS, MEL_WINDOWS, mel_spectrogram
from .utils.host import to_host

from .metrics_stoi import STOI  # noqa: F401  (in-repo perceptual metric)

__all__ = ["PESQ", "STOI", "MelSpectrogramDistance", "SISDR", "EntropyCounter",
           "mel_distance", "sisdr", "mel_distance_masked", "sisdr_masked"]

SR = 16000

try:
    from pesq import pesq as _pesq_fn  # C implementation of ITU-T P.862
    HAVE_PESQ = True
except ImportError:  # pragma: no cover - gated dependency
    _pesq_fn = None
    HAVE_PESQ = False

# Which implementation PESQ() scores with: the ITU ANSI-C library when
# installed (exact published-number comparability), else the in-repo
# NumPy P.862.2 model (esc_tpu/metrics_pesq.py — bit-different from the
# C lib but same pipeline; see its module docstring for the deltas).
PESQ_BACKEND = "pesq-c" if HAVE_PESQ else "numpy-p862"


class PESQ:
    """Batch PESQ-WB (scripts/metrics.py:79-94): ITU C library when
    installed, in-repo NumPy P.862.2 model otherwise (PESQ_BACKEND says
    which). NaN for rows the scorer rejects (e.g. sub-frame lengths).

    ``lengths`` (optional, per-sample true lengths of zero-padded inputs)
    restricts scoring to each utterance's valid samples.
    """

    def __call__(self, x, y, lengths=None) -> np.ndarray:
        x = to_host(x)
        y = to_host(y)
        if not HAVE_PESQ:
            from .metrics_pesq import pesq_wb
            score = lambda a, b: pesq_wb(a, b, SR)  # noqa: E731
        else:
            score = lambda a, b: _pesq_fn(SR, a, b, "wb")  # noqa: E731
        out = []
        for b in range(x.shape[0]):
            n = int(lengths[b]) if lengths is not None else x.shape[-1]
            try:
                out.append(score(x[b, :n], y[b, :n]))
            except Exception:
                out.append(np.nan)
        return np.asarray(out, dtype=np.float32)


@jax.jit
def mel_distance(raw_audio: jnp.ndarray, recon_audio: jnp.ndarray) -> jnp.ndarray:
    """7-scale L1 log-mel distance, per-sample (scripts/metrics.py:96-121)."""
    clamp_eps = 1e-5
    loss = 0.0
    for w, m in zip(MEL_WINDOWS, MEL_BINS):
        x_m = mel_spectrogram(raw_audio, w, m, SR)
        y_m = mel_spectrogram(recon_audio, w, m, SR)
        lx = jnp.log10(jnp.clip(x_m, min=clamp_eps) ** 2)
        ly = jnp.log10(jnp.clip(y_m, min=clamp_eps) ** 2)
        loss += jnp.mean(jnp.abs(lx - ly), axis=(1, 2))
    return loss


@jax.jit
def sisdr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SDR, per-sample (scripts/metrics.py:123-171)."""
    eps = 1e-8
    ref = x - jnp.mean(x, axis=-1, keepdims=True)
    est = y - jnp.mean(y, axis=-1, keepdims=True)
    ref_energy = jnp.sum(ref * ref, axis=-1) + eps
    proj = jnp.sum(ref * est, axis=-1) + eps
    scale = (proj / ref_energy)[..., None]
    e_true = scale * ref
    e_res = est - e_true
    signal = jnp.sum(e_true ** 2, axis=-1)
    noise = jnp.sum(e_res ** 2, axis=-1)
    return 10.0 * jnp.log10(signal / noise + eps)


def _reflect_pad_dynamic(x: jnp.ndarray, n: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Center reflect padding with a *traced* signal length.

    ``x`` is ``(L,)`` zero-padded beyond its true length ``n``; the result
    is ``(L + 2*pad,)`` whose first ``n + 2*pad`` entries equal
    ``jnp.pad(x[:n], pad, mode="reflect")`` for any number of boundary
    reflections (period-``2n-2`` fold), as a single dynamic gather.
    Entries past ``n + 2*pad`` are unspecified (callers mask them out).
    """
    idx = jnp.arange(x.shape[-1] + 2 * pad) - pad
    period = jnp.maximum(2 * n - 2, 1)
    m = jnp.abs(idx) % period
    src = jnp.minimum(m, period - m)
    return x[src]


def _masked_log_mel(x: jnp.ndarray, lengths: jnp.ndarray, n_fft: int,
                    n_mels: int):
    """Log power mel of zero-padded batch ``(B, L)`` at true ``lengths``.

    Returns ``(logmel (B, n_mels, T), frame_mask (B, T), t_valid (B,))``;
    frames ``t < n//hop + 1`` are bit-identical to
    ``mel_spectrogram(x[:n])`` (same reflect-pad boundary semantics).
    """
    from .ops.mel import mel_filterbank
    from .ops.stft import _dft_matrices, frame_signal

    hop = n_fft // 4
    pad = n_fft // 2
    B, L = x.shape
    T = L // hop + 1
    F = n_fft // 2 + 1
    xp = jax.vmap(lambda a, n: _reflect_pad_dynamic(a, n, pad))(
        x.astype(jnp.float32), lengths)
    frames = frame_signal(xp, n_fft, hop, T)
    fwd, _, _ = _dft_matrices(n_fft, n_fft)
    spec = jnp.dot(frames, jnp.asarray(fwd),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).reshape(B, T, 2, F)
    mag = jnp.sqrt(jnp.sum(spec * spec, axis=2) + 1e-24)
    fb = jnp.asarray(mel_filterbank(F, n_mels, SR))
    mel = jnp.einsum("btf,fm->bmt", mag, fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log10(jnp.clip(mel, min=1e-5) ** 2)
    t_valid = lengths // hop + 1
    mask = (jnp.arange(T)[None, :] < t_valid[:, None]).astype(jnp.float32)
    return logmel, mask, t_valid


@jax.jit
def mel_distance_masked(x: jnp.ndarray, y: jnp.ndarray,
                        lengths: jnp.ndarray) -> jnp.ndarray:
    """:func:`mel_distance` over the true (unpadded) span of each sample.

    ``x``/``y`` are ``(B, L)`` zero-padded; ``lengths`` ``(B,)`` int. For
    each sample this equals ``mel_distance(x[:n], y[:n])`` exactly, so
    batched evaluation of unequal-length folders matches batch_size=1.
    """
    loss = 0.0
    for w, m in zip(MEL_WINDOWS, MEL_BINS):
        lx, mask, t_valid = _masked_log_mel(x, lengths, w, m)
        ly, _, _ = _masked_log_mel(y, lengths, w, m)
        diff = jnp.abs(lx - ly) * mask[:, None, :]
        loss += jnp.sum(diff, axis=(1, 2)) / (m * t_valid.astype(jnp.float32))
    return loss


@jax.jit
def sisdr_masked(x: jnp.ndarray, y: jnp.ndarray,
                 lengths: jnp.ndarray) -> jnp.ndarray:
    """:func:`sisdr` over the true (unpadded) span of each sample (exact)."""
    eps = 1e-8
    mask = (jnp.arange(x.shape[-1])[None, :]
            < lengths[:, None]).astype(x.dtype)
    n = lengths.astype(x.dtype)[:, None]
    xm, ym = x * mask, y * mask
    ref = (xm - jnp.sum(xm, axis=-1, keepdims=True) / n) * mask
    est = (ym - jnp.sum(ym, axis=-1, keepdims=True) / n) * mask
    ref_energy = jnp.sum(ref * ref, axis=-1) + eps
    proj = jnp.sum(ref * est, axis=-1) + eps
    scale = (proj / ref_energy)[..., None]
    e_true = scale * ref
    e_res = est - e_true
    signal = jnp.sum(e_true ** 2, axis=-1)
    noise = jnp.sum(e_res ** 2, axis=-1)
    return 10.0 * jnp.log10(signal / noise + eps)


class MelSpectrogramDistance:
    def __call__(self, x, y, lengths=None):
        if lengths is not None:
            return to_host(mel_distance_masked(
                jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(lengths, dtype=jnp.int32)))
        return to_host(mel_distance(jnp.asarray(x), jnp.asarray(y)))


class SISDR:
    def __call__(self, x, y, lengths=None):
        if lengths is not None:
            return to_host(sisdr_masked(
                jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(lengths, dtype=jnp.int32)))
        return to_host(sisdr(jnp.asarray(x), jnp.asarray(y)))


@functools.partial(jax.jit, static_argnums=(1,))
def _code_histograms(codes: jnp.ndarray, codebook_size: int) -> jnp.ndarray:
    """codes (B, S, G, T) -> counts (S, G, codebook_size), one pass."""
    onehot = jax.nn.one_hot(codes, codebook_size, dtype=jnp.float32)
    return jnp.sum(onehot, axis=(0, 3))


@functools.partial(jax.jit, static_argnums=(1,))
def _code_histograms_masked(codes: jnp.ndarray, codebook_size: int,
                            t_valid: jnp.ndarray) -> jnp.ndarray:
    """Masked variant: only code frames ``t < t_valid[b]`` are counted."""
    onehot = jax.nn.one_hot(codes, codebook_size, dtype=jnp.float32)
    mask = (jnp.arange(codes.shape[-1])[None, :]
            < t_valid[:, None]).astype(jnp.float32)  # (B, T)
    return jnp.einsum("bsgtc,bt->sgc", onehot, mask)


class EntropyCounter:
    """Codebook-utilization counter (scripts/metrics.py:12-77).

    The per-(stream, group) histogram update is one vectorized one-hot
    reduction on device instead of the reference's python double loop.
    """

    def __init__(self, codebook_size: int = 1024, num_streams: int = 6,
                 num_groups: int = 3, device: Optional[str] = None):
        self.codebook_size = codebook_size
        self.num_groups = num_groups
        self.reset_stats(num_streams)

    def reset_stats(self, num_streams: int) -> None:
        self.num_streams = num_streams
        self.counts = np.zeros(
            (num_streams, self.num_groups, self.codebook_size), np.float64)
        self.total_counts = 0
        self.dist = None
        self.entropy = None
        self.max_entropy_per_book = np.log2(self.codebook_size)
        self.max_total_entropy = (num_streams * self.num_groups
                                  * self.max_entropy_per_book)

    def update(self, codes, lengths=None,
               samples_per_code: Optional[int] = None) -> None:
        """codes: (B, num_streams, num_groups, T).

        With ``lengths`` (true per-utterance sample counts of a padded
        batch) and ``samples_per_code`` (audio samples covered by one code
        frame, e.g. 320 for ESC-Base), only code frames covering real
        audio are counted — padding never inflates utilization.
        """
        codes = jnp.asarray(codes)
        assert codes.shape[1] == self.num_streams \
            and codes.shape[2] == self.num_groups, "code indices size not match"
        if lengths is not None and samples_per_code:
            t_valid = np.minimum(
                -(-np.asarray(lengths) // samples_per_code),
                codes.shape[-1]).astype(np.int32)
            self.total_counts += int(t_valid.sum())
            self.counts += to_host(_code_histograms_masked(
                codes, self.codebook_size,
                jnp.asarray(t_valid))).astype(np.float64)
            return
        self.total_counts += codes.shape[0] * codes.shape[-1]
        self.counts += to_host(
            _code_histograms(codes, self.codebook_size)).astype(np.float64)

    def _form(self) -> None:
        assert self.total_counts > 0, \
            "No data collected, please update on a specific dataset"
        self.dist = self.counts / self.total_counts
        self.entropy = -np.sum(self.dist * np.log2(self.dist + 1e-10),
                               axis=-1)  # (S, G)

    def compute_utilization(self) -> Tuple[float, Dict[str, float]]:
        """Returns (overall utilization, per-codebook utilization dict)."""
        if self.dist is None or self.entropy is None:
            self._form()
        per_book = {
            f"stream_{s}_group_{g + 1}":
                round(float(self.entropy[s, g]) / self.max_entropy_per_book, 4)
            for s in range(self.num_streams) for g in range(self.num_groups)}
        total = round(float(self.entropy.sum()) / self.max_total_entropy, 4)
        return total, per_book
