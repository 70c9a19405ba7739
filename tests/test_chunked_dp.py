"""Multi-device long-audio inference (esc_tpu/parallel/chunked.py).

Runs on the 8-virtual-CPU-device mesh (conftest). Acceptance mirrors
the single-device chunked tests: interior codes match full-file
encoding, splice quality >25 dB — plus mesh-specific contracts: the
sharded pass is bit-identical to the same uniform-window pass on one
device (wave padding and gather order can't corrupt anything), and a
chunk count not divisible by the device count exercises the
duplicate-filled tail wave.
"""

import jax
import numpy as np
import pytest

from esc_tpu.metrics import sisdr
from esc_tpu.models import make_model
from esc_tpu.parallel import (DataParallel, decode_chunked_dp,
                              encode_chunked_dp)
from tests.test_model_shapes import TINY_CONFIG


@pytest.fixture(scope="module")
def model():
    m = make_model(TINY_CONFIG, "csvq+swinT")
    m.init_params(example_len=7920)
    return m


@pytest.fixture(scope="module")
def dp():
    assert len(jax.devices()) >= 8, "conftest should provide 8 devices"
    return DataParallel(jax.devices()[:8])


def test_dp_encode_matches_full(model, dp, rng):
    L = 2 * 47920 + 80  # ~6 s -> 300 code frames
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)
    full_codes, fs = model.encode(x, num_streams=3)
    codes, fs_dp = encode_chunked_dp(model, x, num_streams=3, dp=dp,
                                     chunk_seconds=0.5,
                                     margin_seconds=0.25)
    assert tuple(fs_dp) == tuple(fs)
    assert np.asarray(codes).shape == np.asarray(full_codes).shape
    agree = (np.asarray(codes) == np.asarray(full_codes)).mean()
    assert agree > 0.95, f"dp-chunked/full code agreement {agree:.3f}"


def test_dp_identical_to_single_device_pass(model, dp, rng):
    """Sharding is a pure execution detail: the 8-device wave pass must
    produce byte-identical codes and waveform to dp=None."""
    L = 2 * 47920 + 80
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)
    kw = dict(num_streams=3, chunk_seconds=0.5, margin_seconds=0.25)
    c_dp, fs = encode_chunked_dp(model, x, dp=dp, **kw)
    c_1d, fs1 = encode_chunked_dp(model, x, dp=None, **kw)
    assert tuple(fs) == tuple(fs1)
    np.testing.assert_array_equal(np.asarray(c_dp), np.asarray(c_1d))
    y_dp = np.asarray(decode_chunked_dp(model, c_dp, fs, dp=dp,
                                        chunk_seconds=0.5,
                                        margin_seconds=0.25))
    y_1d = np.asarray(decode_chunked_dp(model, c_1d, fs1, dp=None,
                                        chunk_seconds=0.5,
                                        margin_seconds=0.25))
    np.testing.assert_array_equal(y_dp, y_1d)


def test_dp_decode_splice_quality(model, dp, rng):
    L = 2 * 47920 + 80
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)
    full_codes, fs = model.encode(x, num_streams=3)
    full_audio = np.asarray(model.decode(full_codes, fs))
    codes, _ = encode_chunked_dp(model, x, num_streams=3, dp=dp,
                                 chunk_seconds=0.5, margin_seconds=0.25)
    y = np.asarray(decode_chunked_dp(model, codes, fs, dp=dp,
                                     chunk_seconds=0.5,
                                     margin_seconds=0.25))
    assert y.shape == full_audio.shape
    # judge the interior (tail zero-padding codes are allowed to differ)
    q = float(np.asarray(sisdr(full_audio[:, :-8000], y[:, :-8000]))[0])
    assert q > 25.0, f"dp-chunked vs full SISDR {q:.1f} dB"


def test_tail_wave_padding(model, dp, rng):
    """Chunk count NOT divisible by 8: the duplicate-filled tail wave
    must not leak padded outputs into the result."""
    L = 47920 + 80  # ~3 s -> 150 codes -> 3 chunks of 64 at 0.5 s
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)
    full_codes, fs = model.encode(x, num_streams=2)
    codes, fs_dp = encode_chunked_dp(model, x, num_streams=2, dp=dp,
                                     chunk_seconds=0.5,
                                     margin_seconds=0.25)
    assert np.asarray(codes).shape == np.asarray(full_codes).shape
    agree = (np.asarray(codes) == np.asarray(full_codes)).mean()
    assert agree > 0.95, agree


def test_batch_rows_stay_separated(model, dp, rng):
    """B=2 long-file batch: per-row codes equal the B=1 runs (the
    wave stacking must not interleave rows)."""
    L = 2 * 47920 + 80
    x = (0.2 * rng.standard_normal((2, L))).astype(np.float32)
    kw = dict(num_streams=2, chunk_seconds=0.5, margin_seconds=0.25)
    c2, fs = encode_chunked_dp(model, x, dp=dp, **kw)
    c0, _ = encode_chunked_dp(model, x[:1], dp=dp, **kw)
    c1, _ = encode_chunked_dp(model, x[1:], dp=dp, **kw)
    np.testing.assert_array_equal(np.asarray(c2[0]), np.asarray(c0[0]))
    np.testing.assert_array_equal(np.asarray(c2[1]), np.asarray(c1[0]))
