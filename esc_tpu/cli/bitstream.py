"""Bit-packed code serialization (.escb format).

The reference ships codes as a raw ``torch.save`` of int64 tensors
(scripts/compress.py:35) — ~64x the nominal bitrate on disk. Here codes
are packed at ceil(log2(codebook_size)) bits per symbol (10 bits for
K=1024) with a small header, so the artifact actually lands at the
advertised kbps.

When the native range coder is built (native/rangecoder.cpp), codes are
additionally entropy-coded with per-(stream, group) adaptive models and
the smaller of the two payloads is written — trained codecs' codebook
usage is sub-uniform (utilization < 1.0), so the range-coded payload
lands BELOW the nominal bitrate.

Format (little-endian):
  magic  b"ESCB"            4 bytes
  version u8: 1 = raw bit-packed payload, 2 = range-coded payload
  bits_per_code u8
  num_streams u8, group_size u8
  batch u16, T u32
  feat_H u16, feat_W u32
  payload: v1: codes flattened (B, S, G, T) row-major, LSB-first bits
           v2: adaptive range-coded symbol stream (same order)
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = ["pack_codes", "unpack_codes"]

_MAGIC = b"ESCB"


def _contexts(B: int, S: int, G: int, T: int) -> np.ndarray:
    """Per-symbol context id = stream * G + group, (B, S, G, T) order."""
    ctx = (np.arange(S)[:, None] * G + np.arange(G)[None, :]).astype(np.int32)
    return np.broadcast_to(ctx[None, :, :, None], (B, S, G, T)).reshape(-1)


def _bits_needed(codebook_size: int) -> int:
    return max(1, int(np.ceil(np.log2(codebook_size))))


def pack_codes(codes: np.ndarray, codebook_size: int,
               feat_shape: Tuple[int, int], entropy: bool = True) -> bytes:
    """codes (B, S, G, T) int -> packed bytes (entropy-coded when the
    native range coder is available and wins)."""
    codes = np.asarray(codes)
    assert codes.ndim == 4, codes.shape
    B, S, G, T = codes.shape
    bits = _bits_needed(codebook_size)
    flat = codes.astype(np.uint64).reshape(-1)

    n = flat.size
    # LSB-first bit packing via a (n, bits) bit matrix -> packbits
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((flat[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    payload = np.packbits(bitmat.reshape(-1), bitorder="little").tobytes()
    version = 1

    if entropy:
        try:
            from ..native import rangecoder as rc
            # alphabet padded to 1<<bits so the decoder (which only sees
            # ``bits``) builds identical models for any codebook_size
            rc_payload = rc.encode(codes.astype(np.int32).reshape(-1),
                                   _contexts(B, S, G, T), 1 << bits,
                                   S * G)
            if len(rc_payload) < len(payload):
                payload, version = rc_payload, 2
        except ImportError:
            pass

    header = _MAGIC + struct.pack("<BBBBHIHI", version, bits, S, G, B, T,
                                  feat_shape[0], feat_shape[1])
    return header + payload


def unpack_codes(blob: bytes) -> Tuple[np.ndarray, Tuple[int, int]]:
    """packed bytes -> (codes (B, S, G, T) int32, feat_shape)."""
    assert blob[:4] == _MAGIC, "not an ESCB bitstream"
    ver, bits, S, G, B, T, fh, fw = struct.unpack("<BBBBHIHI", blob[4:20])
    n = B * S * G * T
    if ver == 2:
        from ..native import rangecoder as rc
        flat = rc.decode(blob[20:], _contexts(B, S, G, T), 1 << bits, S * G)
        return flat.reshape(B, S, G, T), (fh, fw)
    assert ver == 1, f"unsupported version {ver}"
    raw = np.frombuffer(blob[20:], dtype=np.uint8)
    bitvec = np.unpackbits(raw, bitorder="little")[: n * bits]
    bitmat = bitvec.reshape(n, bits).astype(np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    flat = (bitmat << shifts[None, :]).sum(axis=1)
    return flat.astype(np.int32).reshape(B, S, G, T), (fh, fw)
