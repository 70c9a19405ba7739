"""ctypes wrapper over native/wavio.cpp (libescwav.so).

Provides ``load_wav`` (single file) and ``load_wav_batch`` (thread-pool
decode into one dense array) — the native path of
esc_tpu.train.data.load_wav.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libescwav.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(
        f"native wav loader not built ({_LIB_PATH}); run "
        f"`python native/build.py`")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.esc_load_wav.restype = ctypes.c_long
_lib.esc_load_wav.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_long,
                              ctypes.POINTER(ctypes.c_int)]
_lib.esc_load_wav_batch.restype = ctypes.c_int
_lib.esc_load_wav_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_long),
                                    ctypes.c_int]

_MAX_SECONDS = 600  # cap single-file reads at 10 min of 16 kHz audio


def load_wav(path: str, max_len: Optional[int] = None) -> np.ndarray:
    """float32 mono waveform (first channel)."""
    max_len = max_len or _MAX_SECONDS * 16000
    buf = np.empty(max_len, dtype=np.float32)
    sr = ctypes.c_int(0)
    n = _lib.esc_load_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"native wav load failed: {path}")
    return buf[:n].copy()


def load_wav_batch(paths: List[str], max_len: int,
                   num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode many files at once -> ((N, max_len) zero-padded float32,
    (N,) true lengths; -1 marks a failed file)."""
    n = len(paths)
    out = np.zeros((n, max_len), dtype=np.float32)
    lengths = np.zeros(n, dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = _lib.esc_load_wav_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        num_threads)
    if rc != 0:
        raise IOError("native wav batch load failed")
    return out, lengths
