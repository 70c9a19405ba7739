"""Fused window-attention Pallas kernel.

Computes, for tiles of attention windows entirely in VMEM:

    scores = (q * scale) @ k^T + rel_bias[h] (+ shift_mask)
    out    = softmax(scores) @ v

i.e. everything between the qkv and output projections of
``WindowAttention`` (esc/modules/transformer/attention.py:215-241) in a
single kernel — XLA materializes the (G, nh, N, N) attention weights to
HBM between the two batched matmuls; here they live and die in VMEM.

Inputs are the window-partitioned qkv tensors (G, N, C) with the head
dim folded into channels; the relative-position bias (nh, N, N) and the
optional per-window shift mask (broadcast to (G, N, N) as a compile-time
constant — it is static per token grid) ride along in VMEM.

Used when ``G`` is large enough to amortize. fp32 inputs use
HIGHEST-precision dots, identical to the jnp path; bf16 inputs feed the
MXU natively with fp32 accumulation (scores/softmax always fp32),
matching the unfused bf16 einsum path (validated in
tests/test_pallas_attention.py).

Heads are tiled across the second Pallas grid axis in channel-contiguous
groups of at most ``MAX_HEADS_PER_TILE`` (the head-h channels of the
(G, N, C) layout are ``[h*hd, (h+1)*hd)``, so a head group is just a
channel block). This keeps per-instance VMEM bounded at every scale —
including the 24-head stages of ESC-Base that a full-head unroll
overflowed — with no cross-instance communication (softmax is per-head).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention", "fused_attention_profitable"]

TILE_G = 32
MAX_HEADS_PER_TILE = 12


def fused_attention_profitable(nh: int, hd: int) -> bool:
    """True when the kernel beats XLA for this head geometry (measured on
    v5e): either few enough heads to unroll in one full-C tile, or head
    groups that form lane-aligned 128-channel blocks (e.g. nh=24, hd=16
    -> 8-head groups, measured 3.7x over XLA). nh=24 with hd=8 has no
    lane-aligned grouping; its 4D fallback measured ~1.0x, so callers
    should keep the XLA path there (recorded negative result)."""
    if nh <= MAX_HEADS_PER_TILE:
        return True
    return hd > 0 and 128 % hd == 0 and nh % (128 // hd) == 0


def _heads_per_tile(nh: int, hd: int) -> int:
    if nh <= MAX_HEADS_PER_TILE:
        return nh  # one full-C tile, heads unrolled
    if hd > 0 and 128 % hd == 0 and nh % (128 // hd) == 0:
        return 128 // hd  # lane-aligned channel block per head group
    # generic fallback: largest divisor small enough for the 4D path
    for d in range(min(nh, 6), 0, -1):
        if nh % d == 0:
            return d
    return 1


def _precision(dtype):
    # fp32 inputs match the jnp path bit-for-bit via HIGHEST; bf16 inputs
    # feed the MXU natively (fp32 accumulate via preferred_element_type),
    # where a HIGHEST request would trigger multi-pass emulation.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _kernel(nh: int, scale: float, q_ref, k_ref, v_ref, bias_ref, mask_ref,
            out_ref):
    q = q_ref[:]  # (T, N, C_blk) — channel block holding `nh` heads
    k = k_ref[:]
    v = v_ref[:]
    T, N, C = q.shape
    hd = C // nh
    prec = _precision(q.dtype)
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            (q[:, :, sl] * scale).astype(q.dtype), k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (T, N, N) fp32
        s = s + bias_ref[h][None]
        s = s + mask_ref[:]
        p = jax.nn.softmax(s, axis=-1)
        # store straight into the output slice: no concat at the end, so
        # only one head's intermediates are live at a time (the full-head
        # concat kept nh (T, N, hd) buffers alive and overflowed VMEM at
        # nh=24)
        out_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (T, N, hd)


def _kernel4d(scale: float, q_ref, k_ref, v_ref, bias_ref, mask_ref,
              out_ref):
    q = q_ref[:]  # (T, hpt, N, hd) — one head group
    k = k_ref[:]
    v = v_ref[:]
    T, hpt, N, hd = q.shape
    prec = _precision(q.dtype)
    for h in range(hpt):
        s = jax.lax.dot_general(
            (q[:, h] * scale).astype(q.dtype), k[:, h],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (T, N, N) fp32
        s = s + bias_ref[h][None]
        s = s + mask_ref[:]
        p = jax.nn.softmax(s, axis=-1)
        out_ref[:, h] = jax.lax.dot_general(
            p.astype(v.dtype), v[:, h],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                               # (T, N, hd)


def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, mask=None,
                           num_heads: int = 1,
                           scale: float = 1.0,
                           interpret: bool = False,
                           heads_per_tile: int | None = None) -> jnp.ndarray:
    """q/k/v: (G, N, C) window tokens; bias: (nh, N, N); mask: (G, N, N)
    static 0/-100 shift mask or None. Returns (G, N, C) float32.

    bf16 q/k/v stay bf16 through HBM->VMEM (half the bandwidth) and feed
    the MXU natively with fp32 accumulation — scores, bias add, and
    softmax are always fp32, mirroring the unfused bf16 einsum path.
    """
    G, N, C = q.shape
    nh = num_heads
    hd = C // nh
    in_dtype = (jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32)

    # (A head-count-padding variant — nh=24/hd=8 -> nh=32 as two
    # lane-aligned 128-channel groups — was tried here and removed:
    # on real Mosaic the padded layout makes XLA scope a ~16MB stack
    # allocation for the kernel output and the compile fails against
    # the 16MB scoped-vmem limit, at every window count. Recorded
    # negative; the generic 4D path below handles that geometry, and
    # `fused_attention_profitable` keeps production on XLA for it.)
    hpt = heads_per_tile or _heads_per_tile(nh, hd)
    g_pad = ((G + TILE_G - 1) // TILE_G) * TILE_G
    if g_pad != G:
        pad = ((0, g_pad - G), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        if mask is not None:
            mask = jnp.pad(mask, pad)
    if mask is None:
        mask = jnp.zeros((1, N, N), jnp.float32)
        mask_spec = pl.BlockSpec((1, N, N), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((TILE_G, N, N), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hpt, N, N), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    grid = (g_pad // TILE_G, nh // hpt)

    if hpt == nh:
        # single head group: keep the transpose-free (G, N, C) layout
        # (block channel dim == full C, always a legal Mosaic block)
        qkv_spec = pl.BlockSpec((TILE_G, N, C), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, nh, scale),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((g_pad, N, C), jnp.float32),
            interpret=interpret,
        )(q.astype(in_dtype), k.astype(in_dtype),
          v.astype(in_dtype), bias.astype(jnp.float32),
          mask.astype(jnp.float32))
        return out[:G]

    if (hpt * hd) % 128 == 0:
        # head group is a lane-aligned channel block: stay in the
        # transpose-free (G, N, C) layout and block the channel dim
        qkv_spec = pl.BlockSpec((TILE_G, N, hpt * hd),
                                lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, hpt, scale),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((g_pad, N, C), jnp.float32),
            interpret=interpret,
        )(q.astype(in_dtype), k.astype(in_dtype),
          v.astype(in_dtype), bias.astype(jnp.float32),
          mask.astype(jnp.float32))
        return out[:G]

    # many heads, unaligned group width: tile head groups over the second
    # grid axis in a (G, nh, N, hd) layout, whose last two block dims are
    # the full array dims (Mosaic-legal for any nh). The qkv/out
    # transposes are the same ones the unfused path performs to split
    # heads.
    def _split(t):
        return t.astype(in_dtype).reshape(g_pad, N, nh, hd) \
            .transpose(0, 2, 1, 3)  # (G, nh, N, hd)

    qkv_spec = pl.BlockSpec((TILE_G, hpt, N, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel4d, scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, nh, N, hd), jnp.float32),
        interpret=interpret,
    )(_split(q), _split(k), _split(v), bias.astype(jnp.float32),
      mask.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).reshape(g_pad, N, C)
    return out[:G]
