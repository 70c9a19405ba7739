"""Deterministic SPEECH-LIKE synthetic corpus (source-filter model).

The round-3 quality longrun trained on bare harmonic stacks
(tools/quality_trajectory.make_corpus). That corpus is PERIODIC: at
reduced stream counts the decoder can be right up to a global phase
drift that costs raw SI-SDR everything (the diagnosed SISDR@3 = -49 dB
artifact, tests/golden/quality_longrun.json: ns3_diagnostic). Real
speech — the reference's DNS corpus — has transient anchors (glottal
closures, plosive/fricative onsets, silences), which is what makes its
low-bitrate SI-SDR meaningful (reference results.png: +2 dB at
1.5 kbps).

This generator closes that gap with a classic source-filter synthesis:

* glottal source: bandlimited pulse train (harmonics to 7 kHz, 1/h
  rolloff, coherent phase -> sharp glottal closure instants) with a
  per-syllable F0 accent contour and utterance declination;
* filter: time-varying vowel formants (F1-F4 targets from the classic
  Peterson-Barney-style table, linearly interpolated across each
  syllable) applied as zero-phase magnitude filtering per 16 ms STFT
  frame — pulse timing (the SI-SDR anchor) is preserved exactly;
* unvoiced onsets: 30-60 ms of fricative-band (2-7 kHz) noise before a
  random subset of syllables;
* syllabic rhythm: ~4-6 syl/s with true inter-syllable silences and a
  smooth per-syllable amplitude envelope;
* optional additive noise floor at a given SNR (off by default: i.i.d.
  noise floors poison the power-law STFT loss — see
  quality_trajectory.make_corpus's docstring).

Everything is numpy, deterministic in `seed`, and writes the same
8000-sample (0.5 s) clips the longrun tooling expects, so it is a
drop-in via --corpus speechlike.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SR = 16000
CLIP_LEN = 8000   # 7920 after EvalSet trim -> T=100 STFT frames (even)
N_CLIPS = 32

# vowel formant targets (Hz): F1, F2, F3, F4 — male-ish averages
_VOWELS = {
    "a": (730, 1090, 2440, 3400),
    "e": (530, 1840, 2480, 3500),
    "i": (270, 2290, 3010, 3700),
    "o": (570, 840, 2410, 3300),
    "u": (300, 870, 2240, 3400),
    "ə": (500, 1500, 2500, 3500),
}
_BW = (60.0, 90.0, 140.0, 220.0)  # formant bandwidths (Hz)

_FRAME = 256   # 16 ms analysis frame for the time-varying filter
_HOP = 128


def _formant_gain(freqs: np.ndarray, formants: np.ndarray) -> np.ndarray:
    """|H(f)| of a cascade of resonators. freqs (F,), formants (..., 4)
    -> gains (..., F)."""
    f = freqs[None, :]
    g = np.ones(formants.shape[:-1] + (len(freqs),))
    for k in range(4):
        fc = formants[..., k:k + 1]
        bw = _BW[k]
        # second-order resonance magnitude, peak-normalized
        num = (bw / 2) ** 2 * (fc ** 2 + (bw / 2) ** 2)
        den = ((f ** 2 - fc ** 2) ** 2 + (bw * f) ** 2) / 4 + \
            (bw / 2) ** 2 * f ** 2
        g = g * np.sqrt(num / (den + 1e-12))
    # gentle +6 dB/oct radiation lift so highs are not buried
    g = g * (1.0 + f / 3000.0)
    return g


def _glottal_source(n: int, f0_track: np.ndarray) -> np.ndarray:
    """Bandlimited pulse train with instantaneous F0 given per sample.
    Coherent harmonic phases -> a sharp closure instant each period."""
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    x = np.zeros(n)
    h = 1
    while True:
        fmax = float(f0_track.max()) * h
        if fmax > 7000.0:
            break
        x += np.cos(h * phase) / h
        h += 1
    return x


def _stft_filter(x: np.ndarray, formant_tracks: np.ndarray) -> np.ndarray:
    """Zero-phase time-varying magnitude filter via overlap-add.
    formant_tracks: (n_frames, 4) Hz."""
    n = len(x)
    n_frames = 1 + (n - _FRAME) // _HOP
    w = np.hanning(_FRAME)
    freqs = np.fft.rfftfreq(_FRAME, 1.0 / SR)
    idx = np.arange(_FRAME)[None, :] + _HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * w
    spec = np.fft.rfft(frames, axis=1)
    gains = _formant_gain(freqs, formant_tracks[:n_frames])
    y_frames = np.fft.irfft(spec * gains, _FRAME, axis=1) * w
    out = np.zeros(n)
    norm = np.zeros(n)
    for i in range(n_frames):            # weighted overlap-add
        out[i * _HOP:i * _HOP + _FRAME] += y_frames[i]
        norm[i * _HOP:i * _HOP + _FRAME] += w ** 2
    return out / np.maximum(norm, 1e-3)


def _synth_clip(rng: np.random.Generator, clip_len: int = CLIP_LEN,
                snr_db: float | None = None) -> np.ndarray:
    t_all = np.arange(clip_len)
    base_f0 = rng.uniform(85.0, 220.0)
    vowels = list(_VOWELS.values())

    audio = np.zeros(clip_len)
    pos = int(rng.uniform(0, 0.04 * SR))
    syl_i = 0
    while pos < clip_len - 800:
        # optional unvoiced fricative onset
        if rng.uniform() < 0.45:
            dur = int(rng.uniform(0.03, 0.06) * SR)
            dur = min(dur, clip_len - pos)
            noise = rng.standard_normal(dur)
            spec = np.fft.rfft(noise)
            f = np.fft.rfftfreq(dur, 1.0 / SR)
            lo = rng.uniform(1800, 3000)
            band = 1.0 / (1.0 + np.exp(-(f - lo) / 300.0))
            noise = np.fft.irfft(spec * band, dur)
            env = np.sin(np.pi * np.arange(dur) / dur) ** 0.7
            audio[pos:pos + dur] += 0.25 * noise / (np.abs(noise).max()
                                                    + 1e-9) * env
            pos += dur
        # voiced nucleus
        dur = int(rng.uniform(0.10, 0.18) * SR)
        dur = min(dur, clip_len - pos)
        if dur < 400:
            break
        tt = np.arange(dur) / dur
        # F0: declination + per-syllable rise-fall accent + jitter
        f0 = base_f0 * (1.0 - 0.10 * (pos / clip_len)) \
            * (1.0 + 0.18 * np.sin(np.pi * tt) * rng.uniform(0.3, 1.0)) \
            * (1.0 + 0.006 * rng.standard_normal(dur).cumsum() / 40.0)
        f0 = np.clip(f0, 70.0, 320.0)
        src = _glottal_source(dur, f0)
        # vowel-to-vowel formant glide across the syllable
        v0 = np.asarray(vowels[rng.integers(len(vowels))], float)
        v1 = np.asarray(vowels[rng.integers(len(vowels))], float)
        n_frames = 1 + max(0, dur - _FRAME) // _HOP
        ft = np.linspace(0, 1, max(n_frames, 2))[:, None]
        tracks = v0[None, :] * (1 - ft) + v1[None, :] * ft
        tracks *= rng.uniform(0.92, 1.08)   # speaker variation
        if dur >= _FRAME:
            voiced = _stft_filter(src, tracks)
        else:
            voiced = src
        env = np.sin(np.pi * tt) ** 0.5
        peak = np.abs(voiced).max() + 1e-9
        audio[pos:pos + dur] += rng.uniform(0.6, 1.0) * voiced / peak * env
        pos += dur
        # inter-syllable gap (true silence — a transient anchor)
        pos += int(rng.uniform(0.02, 0.09) * SR)
        syl_i += 1

    audio = audio / (np.abs(audio).max() + 1e-9) * 0.71
    # recording-floor dither (-75 dB): real corpora (the reference's DNS
    # recordings) never contain exact digital zeros; bit-true silence
    # sits on the power-law loss's gradient singularity (losses.py
    # GRAD_FLOOR note). Inaudible and far below the -34 dB level where
    # the r3 noise-floor loss pathology appeared.
    audio = audio + 1.8e-4 * rng.standard_normal(clip_len)
    if snr_db is not None:
        noise = rng.standard_normal(clip_len)
        noise *= np.linalg.norm(audio) / np.linalg.norm(noise) \
            * 10 ** (-snr_db / 20)
        audio = audio + noise
        audio = audio / (np.abs(audio).max() + 1e-9) * 0.71
    return audio.astype(np.float32)


def make_speech_corpus(folder: str, n_clips: int = N_CLIPS, seed: int = 7,
                       clip_len: int = CLIP_LEN,
                       snr_db: float | None = None) -> None:
    from esc_tpu.train.data import save_wav
    rng = np.random.default_rng(seed)
    os.makedirs(folder, exist_ok=True)
    for i in range(n_clips):
        save_wav(os.path.join(folder, f"speech_{i:02d}.wav"),
                 _synth_clip(rng, clip_len, snr_db))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/esc_speech_corpus")
    p.add_argument("--n", type=int, default=N_CLIPS)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--clip-len", type=int, default=CLIP_LEN)
    p.add_argument("--snr-db", type=float, default=None)
    a = p.parse_args()
    make_speech_corpus(a.out, a.n, a.seed, a.clip_len, a.snr_db)
    print(f"wrote {a.n} clips to {a.out}")
