"""Bitstream formats: raw bit-packing (v1) and entropy-coded (v2)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from esc_tpu.cli.bitstream import pack_codes, unpack_codes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_native():
    so = os.path.join(REPO, "esc_tpu", "native", "libescrc.so")
    if not os.path.exists(so):
        try:
            subprocess.check_call(
                [sys.executable, os.path.join(REPO, "native", "build.py")])
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native toolchain unavailable: {e}")


def test_v1_roundtrip(rng):
    codes = rng.integers(0, 1024, (2, 6, 3, 150)).astype(np.int32)
    blob = pack_codes(codes, 1024, (2, 300), entropy=False)
    back, fs = unpack_codes(blob)
    np.testing.assert_array_equal(back, codes)
    assert fs == (2, 300)
    # payload lands at the nominal 10 bits/code
    assert len(blob) - 20 == int(np.ceil(codes.size * 10 / 8))


def test_v2_entropy_roundtrip_and_wins_on_skewed(rng):
    _ensure_native()
    # skewed usage (what trained codecs produce, utilization < 1)
    probs = rng.dirichlet(np.full(1024, 0.03))
    codes = rng.choice(1024, (2, 6, 3, 600), p=probs).astype(np.int32)
    blob = pack_codes(codes, 1024, (2, 1200), entropy=True)
    assert blob[4] == 2  # range-coded version chosen
    back, fs = unpack_codes(blob)
    np.testing.assert_array_equal(back, codes)
    raw = pack_codes(codes, 1024, (2, 1200), entropy=False)
    assert len(blob) < len(raw), (len(blob), len(raw))


def test_v2_falls_back_on_uniform(rng):
    _ensure_native()
    # uniform codes: entropy coding can't win; pack must pick v1
    codes = rng.integers(0, 1024, (1, 6, 3, 150)).astype(np.int32)
    blob = pack_codes(codes, 1024, (1, 300), entropy=True)
    assert blob[4] == 1
    back, _ = unpack_codes(blob)
    np.testing.assert_array_equal(back, codes)


def test_non_power_of_two_codebook(rng):
    _ensure_native()
    probs = rng.dirichlet(np.full(600, 0.02))
    codes = rng.choice(600, (1, 4, 3, 500), p=probs).astype(np.int32)
    blob = pack_codes(codes, 600, (2, 1000), entropy=True)
    back, _ = unpack_codes(blob)
    np.testing.assert_array_equal(back, codes)
