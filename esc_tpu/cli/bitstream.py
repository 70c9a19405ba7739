"""Bit-packed code serialization (.escb format).

The reference ships codes as a raw ``torch.save`` of int64 tensors
(scripts/compress.py:35) — ~64x the nominal bitrate on disk. Here codes
are packed at ceil(log2(codebook_size)) bits per symbol (10 bits for
K=1024) with a small header, so the artifact actually lands at the
advertised kbps.

Format (little-endian):
  magic  b"ESCB"            4 bytes
  version u8 = 1
  bits_per_code u8
  num_streams u8, group_size u8
  batch u16, T u32
  feat_H u16, feat_W u32
  payload: codes flattened (B, S, G, T) row-major, LSB-first bitstream
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = ["pack_codes", "unpack_codes"]

_MAGIC = b"ESCB"


def _bits_needed(codebook_size: int) -> int:
    return max(1, int(np.ceil(np.log2(codebook_size))))


def pack_codes(codes: np.ndarray, codebook_size: int,
               feat_shape: Tuple[int, int]) -> bytes:
    """codes (B, S, G, T) int -> packed bytes."""
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

    header = _MAGIC + struct.pack("<BBBBHIHI", 1, bits, S, G, B, T,
                                  feat_shape[0], feat_shape[1])
    return header + payload


def unpack_codes(blob: bytes) -> Tuple[np.ndarray, Tuple[int, int]]:
    """packed bytes -> (codes (B, S, G, T) int32, feat_shape)."""
    assert blob[:4] == _MAGIC, "not an ESCB bitstream"
    ver, bits, S, G, B, T, fh, fw = struct.unpack("<BBBBHIHI", blob[4:20])
    assert ver == 1, f"unsupported version {ver}"
    n = B * S * G * T
    raw = np.frombuffer(blob[20:], dtype=np.uint8)
    bitvec = np.unpackbits(raw, bitorder="little")[: n * bits]
    bitmat = bitvec.reshape(n, bits).astype(np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    flat = (bitmat << shifts[None, :]).sum(axis=1)
    return flat.astype(np.int32).reshape(B, S, G, T), (fh, fw)
