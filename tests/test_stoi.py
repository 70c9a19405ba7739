"""STOI metric properties (esc_tpu/metrics_stoi.py).

No reference STOI implementation is installable in this image, so the
metric is validated against the defining properties of Taal et al. 2011:
perfect score on transparent signals, strict monotonicity in SNR, ~0 on
uncorrelated noise, invariance to appended silence (the silent-frame
removal stage), and NaN on too-short active speech.

(The synthetic harmonic fixture concentrates energy in few third-octave
bands, so absolute scores under additive noise sit lower than real
broadband speech would — only orderings are asserted.)
"""

import numpy as np
import pytest

from esc_tpu.metrics import STOI
from esc_tpu.metrics_stoi import stoi

SR = 16000


@pytest.fixture(scope="module")
def speechlike():
    t = np.arange(3 * SR) / SR
    x = sum(np.sin(2 * np.pi * 120 * k * t) * np.exp(-0.3 * k)
            for k in range(1, 8))
    x = x * (0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t))
    return (x / np.abs(x).max()).astype(np.float64)


def test_transparent_is_one(speechlike):
    assert stoi(speechlike, speechlike, SR) == pytest.approx(1.0, abs=1e-3)


def test_monotone_in_snr(speechlike):
    rng = np.random.default_rng(0)
    n = rng.standard_normal(len(speechlike))
    n /= np.linalg.norm(n)

    def at_snr(snr_db):
        noise = n * np.linalg.norm(speechlike) * 10 ** (-snr_db / 20)
        return stoi(speechlike, speechlike + noise, SR)

    scores = [at_snr(s) for s in (20, 10, 0, -10)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.5 and scores[-1] < 0.35, scores


def test_uncorrelated_noise_near_zero(speechlike):
    rng = np.random.default_rng(1)
    got = stoi(speechlike, rng.standard_normal(len(speechlike)), SR)
    assert abs(got) < 0.1, got


def test_silence_invariant(speechlike):
    """Appending silence must not move the score: the 40 dB silent-frame
    removal stage drops those frames before analysis."""
    pad = np.zeros(SR // 2)
    a = stoi(speechlike, speechlike, SR)
    b = stoi(np.concatenate([speechlike, pad]),
             np.concatenate([speechlike, pad]), SR)
    assert b == pytest.approx(a, abs=2e-2)


def test_too_short_is_nan():
    x = np.sin(2 * np.pi * 200 * np.arange(SR // 10) / SR)  # 100 ms
    assert np.isnan(stoi(x, x, SR))


def test_batch_wrapper_with_lengths(speechlike):
    rng = np.random.default_rng(2)
    noisy = speechlike + 0.1 * rng.standard_normal(len(speechlike))
    x = np.stack([speechlike, speechlike])
    y = np.stack([speechlike, noisy])
    got = STOI()(x, y, lengths=np.array([len(speechlike), len(speechlike)]))
    assert got.shape == (2,)
    assert got[0] == pytest.approx(1.0, abs=1e-3)
    assert got[1] < got[0]
    # masking: trailing garbage beyond `lengths` must not affect scores
    y2 = y.copy()
    y2[:, -SR:] = 1e3
    got2 = STOI()(x, y2, lengths=np.array([len(speechlike) - SR] * 2))
    ref = STOI()(x[:, :-SR], y[:, :-SR])
    assert np.allclose(got2, ref, atol=1e-9)


def test_zero_and_subframe_lengths_nan_not_crash(speechlike):
    """ADVICE r3 (high): the pad_eval collate pads the final partial
    batch with length-0 rows and eval_epoch computes metrics before the
    keep filter — zero/sub-frame rows must yield NaN, never raise."""
    x = np.stack([speechlike, speechlike])
    got = STOI()(x, x, lengths=np.array([len(speechlike), 0]))
    assert got[0] == pytest.approx(1.0, abs=1e-3)
    assert np.isnan(got[1])
    # sub-frame but nonzero (< 25.6 ms of audio)
    got = STOI()(x, x, lengths=np.array([100, len(speechlike)]))
    assert np.isnan(got[0]) and got[1] == pytest.approx(1.0, abs=1e-3)
    assert np.isnan(stoi(np.zeros(0), np.zeros(0), SR))


def test_fallback_resampler_matches_scipy(speechlike):
    """The in-repo polyphase fallback (used when scipy is absent) must
    track scipy.signal.resample_poly on the 16k->10k path STOI uses."""
    scipy_signal = pytest.importorskip("scipy.signal")
    import esc_tpu.metrics_stoi as ms

    got = ms._resample_poly.__wrapped__(speechlike, 5, 8) \
        if hasattr(ms._resample_poly, "__wrapped__") else None
    # force the numpy path by nulling the scipy symbol
    old = ms._scipy_resample_poly
    try:
        ms._scipy_resample_poly = None
        ours = ms._resample_poly(speechlike, 5, 8)
    finally:
        ms._scipy_resample_poly = old
    ref = scipy_signal.resample_poly(speechlike, 5, 8)
    assert ours.shape == ref.shape
    err = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
    assert err < 1e-6, err
    # and the STOI score itself is insensitive to which path ran
    try:
        ms._scipy_resample_poly = None
        s_fallback = stoi(speechlike, speechlike, SR)
    finally:
        ms._scipy_resample_poly = old
    assert s_fallback == pytest.approx(1.0, abs=1e-3)
