"""ctypes wrapper over native/rangecoder.cpp (libescrc.so): adaptive
range coding of VQ code streams with per-(stream, group) contexts."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libescrc.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(
        f"native range coder not built ({_LIB_PATH}); run "
        f"`python native/build.py`")

_lib = ctypes.CDLL(_LIB_PATH)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_lib.esc_rc_encode.restype = ctypes.c_long
_lib.esc_rc_encode.argtypes = [_i32p, _i32p, ctypes.c_long, ctypes.c_int,
                               ctypes.c_int, _u8p, ctypes.c_long]
_lib.esc_rc_decode.restype = ctypes.c_long
_lib.esc_rc_decode.argtypes = [_u8p, ctypes.c_long, _i32p, ctypes.c_long,
                               ctypes.c_int, ctypes.c_int, _i32p]


def encode(symbols: np.ndarray, contexts: np.ndarray, K: int,
           n_ctx: int) -> bytes:
    """Range-encode int symbols (< K) with context ids (< n_ctx)."""
    symbols = np.ascontiguousarray(symbols, np.int32).reshape(-1)
    contexts = np.ascontiguousarray(contexts, np.int32).reshape(-1)
    assert symbols.shape == contexts.shape
    cap = symbols.size * 4 + 64
    out = np.empty(cap, np.uint8)
    n = _lib.esc_rc_encode(symbols.ctypes.data_as(_i32p),
                           contexts.ctypes.data_as(_i32p), symbols.size,
                           K, n_ctx, out.ctypes.data_as(_u8p), cap)
    if n < 0:
        raise RuntimeError("range coder output overflow")
    return out[:n].tobytes()


def decode(blob: bytes, contexts: np.ndarray, K: int,
           n_ctx: int) -> np.ndarray:
    """Inverse of :func:`encode` (same contexts sequence)."""
    contexts = np.ascontiguousarray(contexts, np.int32).reshape(-1)
    data = np.frombuffer(blob, np.uint8)
    out = np.empty(contexts.size, np.int32)
    _lib.esc_rc_decode(data.ctypes.data_as(_u8p), data.size,
                       contexts.ctypes.data_as(_i32p), contexts.size,
                       K, n_ctx, out.ctypes.data_as(_i32p))
    return out
