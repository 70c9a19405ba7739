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

Used when ``G`` is large enough to amortize; numerics are fp32 with
HIGHEST-precision dots, identical to the jnp path (validated in
tests/test_pallas_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention"]

TILE_G = 32


def _kernel(nh: int, scale: float, q_ref, k_ref, v_ref, bias_ref, mask_ref,
            out_ref):
    q = q_ref[:]  # (T, N, C)
    k = k_ref[:]
    v = v_ref[:]
    T, N, C = q.shape
    hd = C // nh
    outs = []
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, :, sl] * scale, k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (T, N, N)
        s = s + bias_ref[h][None]
        s = s + mask_ref[:]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p, v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (T, N, hd)
        outs.append(o)
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, mask=None,
                           num_heads: int = 1,
                           scale: float = 1.0,
                           interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (G, N, C) window tokens; bias: (nh, N, N); mask: (G, N, N)
    static 0/-100 shift mask or None. Returns (G, N, C)."""
    G, N, C = q.shape
    g_pad = ((G + TILE_G - 1) // TILE_G) * TILE_G
    if g_pad != G:
        pad = ((0, g_pad - G), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        if mask is not None:
            mask = jnp.pad(mask, pad)
    if mask is None:
        mask = jnp.zeros((1, N, N), jnp.float32)
        mask_spec = pl.BlockSpec((1, N, N), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((TILE_G, N, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    grid = (g_pad // TILE_G,)
    qkv_spec = pl.BlockSpec((TILE_G, N, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads, scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((bias.shape[0], N, N), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, N, C), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out[:G]
