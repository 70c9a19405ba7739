"""Native C++ wav loader parity with the pure-python reader.

Builds the shared library on demand (g++ is in the image); skips if the
toolchain is unavailable.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wavio():
    so = os.path.join(REPO, "esc_tpu", "native", "libescwav.so")
    if not os.path.exists(so):
        try:
            subprocess.check_call(
                [sys.executable, os.path.join(REPO, "native", "build.py")])
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native toolchain unavailable: {e}")
    from esc_tpu.native import wavio as w
    return w


@pytest.fixture
def wav_file(tmp_path, rng):
    from esc_tpu.train.data import save_wav
    x = (0.5 * rng.standard_normal(12345)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, x)
    return p


def test_native_matches_python(wavio, wav_file):
    from esc_tpu.train.data import _load_wav_python
    a = wavio.load_wav(wav_file)
    b = _load_wav_python(wav_file)
    assert a.shape == b.shape == (12345,)
    np.testing.assert_array_equal(a, b)


def test_batch_load(wavio, wav_file):
    out, lens = wavio.load_wav_batch([wav_file] * 5, 20000, num_threads=3)
    assert out.shape == (5, 20000)
    assert lens.tolist() == [12345] * 5
    assert (out[:, 12345:] == 0).all()


def test_batch_load_bad_file(wavio, tmp_path, wav_file):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav")
    out, lens = wavio.load_wav_batch([wav_file, bad], 20000)
    assert lens.tolist()[0] == 12345
    assert lens.tolist()[1] == -1
    assert (out[1] == 0).all()
