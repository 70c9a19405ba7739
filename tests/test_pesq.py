"""Behavioral contract for the in-repo NumPy PESQ-WB (metrics_pesq.py).

The ITU C library is not installable in this image, so exact-score
validation is impossible here; instead the implementation is held to
the defining behaviors of P.862.2 that the eval harness relies on:
near-ceiling on transparent signals, strict monotonicity in SNR and in
bandwidth truncation, robustness to the constant delays codecs
introduce, NaN (not crash) on degenerate rows, and checkpoint-ranking
agreement with STOI on a graded degradation ladder.
"""

import numpy as np
import pytest

from esc_tpu.metrics import PESQ, HAVE_PESQ
from esc_tpu.metrics_pesq import pesq_wb

SR = 16000


@pytest.fixture(scope="module")
def speech():
    """Formant-ish harmonic complex with a syllabic envelope."""
    rng = np.random.default_rng(3)
    t = np.arange(4 * SR) / SR
    f0 = 110 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    x = sum(np.sin(k * phase) * np.exp(-0.35 * k) for k in range(1, 12))
    x *= 0.55 + 0.45 * np.sin(2 * np.pi * 2.1 * t)
    x += 0.01 * rng.standard_normal(len(t))
    return (x / np.abs(x).max()).astype(np.float64)


def test_transparent_near_ceiling(speech):
    got = pesq_wb(speech, speech)
    assert got > 4.2, got  # P.862.2 ceiling is ~4.64


def test_monotone_in_snr(speech):
    rng = np.random.default_rng(0)
    n = rng.standard_normal(len(speech))
    n /= np.linalg.norm(n)

    def at_snr(snr_db):
        noise = n * np.linalg.norm(speech) * 10 ** (-snr_db / 20)
        return pesq_wb(speech, speech + noise)

    scores = [at_snr(s) for s in (40, 25, 15, 5, -5)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.2 and scores[-1] < 2.0, scores


def test_monotone_in_bandwidth(speech):
    """Low-pass truncation (a codec-like degradation) must rank by
    cutoff frequency."""
    def lowpassed(fc):
        X = np.fft.rfft(speech)
        f = np.fft.rfftfreq(len(speech), 1 / SR)
        return np.fft.irfft(X * (f <= fc), len(speech))

    scores = [pesq_wb(speech, lowpassed(fc)) for fc in (7000, 3000, 1200)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores


def test_delay_robust(speech):
    """A 10 ms constant delay (codec latency) must not tank the score —
    the alignment stage has to absorb it."""
    d = SR // 100
    delayed = np.concatenate([np.zeros(d), speech])[: len(speech)]
    aligned = pesq_wb(speech, delayed)
    assert aligned > 4.0, aligned


def test_degenerate_inputs_nan_not_crash():
    assert np.isnan(pesq_wb(np.zeros(100), np.zeros(100)))
    assert np.isnan(pesq_wb(np.zeros(4 * SR), np.zeros(4 * SR)))


def test_batch_wrapper_and_lengths(speech):
    rng = np.random.default_rng(1)
    noisy = speech + 0.05 * rng.standard_normal(len(speech))
    x = np.stack([speech, speech])
    y = np.stack([speech, noisy])
    got = PESQ()(x, y, lengths=np.array([len(speech), len(speech)]))
    assert got.shape == (2,)
    if not HAVE_PESQ:
        assert got[0] > 4.2 and got[1] < got[0], got
    # zero-length padded row -> NaN, not crash
    got = PESQ()(x, y, lengths=np.array([len(speech), 0]))
    assert np.isnan(got[1])


def test_ranking_agrees_with_stoi(speech):
    """Checkpoint selection only needs ORDER agreement: on a graded
    noise ladder PESQ and STOI must induce the same ranking (VERDICT r3
    item 6's acceptance for the PESQ-absent environment)."""
    from esc_tpu.metrics_stoi import stoi
    rng = np.random.default_rng(2)
    n = rng.standard_normal(len(speech))
    n /= np.linalg.norm(n)
    degs = [speech + n * np.linalg.norm(speech) * 10 ** (-s / 20)
            for s in (30, 18, 8, 0)]
    p = [pesq_wb(speech, d) for d in degs]
    s = [stoi(speech, d, SR) for d in degs]
    assert np.array_equal(np.argsort(p), np.argsort(s)), (p, s)


# ---------------------------------------------------------------------
# Calibration battery (VERDICT r4 item 6): known-ordering degradations
# beyond plain additive noise, and plausible-MOS-range pins. The scale
# caveat stands — numpy-p862 values are NOT comparable to ITU-C-lib
# numbers (see module docstring of esc_tpu/metrics_pesq.py and the
# ``pesq_backend`` field every artifact records) — but ORDERINGS and
# coarse ranges must hold for the metric to support checkpoint
# selection and bitrate curves.
# ---------------------------------------------------------------------

def test_monotone_in_mnru_q(speech):
    """MNRU (ITU-T P.810 modulated-noise reference unit): speech plus
    speech-correlated noise at Q dB. The canonical PESQ calibration
    ladder — scores must rank by Q."""
    rng = np.random.default_rng(5)
    n = rng.standard_normal(len(speech))

    def mnru(q_db):
        return speech * (1.0 + 10 ** (-q_db / 20) * n)

    scores = [pesq_wb(speech, mnru(q)) for q in (35, 25, 15, 5)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.0 and scores[-1] < 2.5, scores


def test_monotone_in_quantization_depth(speech):
    """Uniform scalar quantization (bit-crush) at stepped depths — a
    codec-like distortion ladder; must rank by bit depth and a 3-bit
    crush must NOT score near-transparent (the r4 objection: a broken
    metric that emits 4.5 for heavily-coded speech)."""
    def crush(bits):
        q = 2.0 ** (bits - 1)
        return np.round(speech * q) / q

    scores = [pesq_wb(speech, crush(b)) for b in (10, 6, 4, 3)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5, scores
    assert scores[-1] < 3.6, scores


def test_plausible_mos_ranges(speech):
    """Coarse absolute pins so the scale cannot silently drift to
    all-ceiling or all-floor: clean ~ceiling, SNR 20 dB mid-range,
    SNR 0 dB bad."""
    rng = np.random.default_rng(6)
    n = rng.standard_normal(len(speech))
    n /= np.linalg.norm(n)

    def at_snr(snr_db):
        return pesq_wb(
            speech, speech + n * np.linalg.norm(speech)
            * 10 ** (-snr_db / 20))

    assert pesq_wb(speech, speech) > 4.2
    mid, bad = at_snr(20), at_snr(0)
    assert 1.8 < mid < 4.3, mid
    assert bad < 2.0, bad
    assert np.isfinite(mid) and np.isfinite(bad)


def test_short_clip_does_not_crash():
    """Sub-span clips (< 20 active frames after VAD/delay cropping) must
    aggregate over the frames that exist — regression for the
    IndexError hit by test_adv_stage_short_run_is_stable's 0.5 s
    harmonic-corpus eval (metrics_pesq.py psqm windowing)."""
    rng = np.random.default_rng(0)
    t = np.arange(4000) / 16000.0  # 0.25 s
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for deg in (ref + 0.05 * rng.standard_normal(4000).astype(np.float32),
                ref,                      # identical
                0.0 * ref):               # silence
        mos = pesq_wb(ref, deg, 16000)
        assert np.isfinite(mos) and 0.0 <= mos <= 5.0, mos
