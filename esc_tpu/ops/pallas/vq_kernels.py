"""Codebook nearest-neighbor search as a Pallas TPU kernel.

The north-star hot op (BASELINE.json): the L2 distance-argmin over a
(K, d) codebook expressed as a tiled matmul + top-1 reduction entirely
in VMEM. For each tile of query rows the kernel computes

    dist = |z|^2 - 2 z @ C^T + |C|^2        (codebook.py:35-40 order)

on the MXU and reduces argmin on the VPU, writing int32 codes. The
feature dim (8..32) is zero-padded to the 128-lane width — padding
contributes zero to every term so distances are unchanged.

Falls back to the identical-jnp path off-TPU; ``interpret=True`` is used
under tests to validate the kernel logic on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["codebook_argmin"]

TILE_N = 256
LANE = 128


def _argmin_kernel(z_ref, ct_ref, csq_ref, out_ref):
    """One tile: z (TILE_N, d_pad) x ct (d_pad, K) -> codes (TILE_N, 1)."""
    z = z_ref[:]
    zsq = jnp.sum(z * z, axis=1, keepdims=True)                 # (T, 1)
    scores = jnp.dot(z, ct_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)       # (T, K) MXU
    dist = zsq - 2.0 * scores + csq_ref[:]                      # (T, K) VPU
    # First-index-stable argmin: Mosaic's native argmin lowering breaks
    # lowest-index tie-break on-chip (observed on exact-duplicate
    # codebook rows: interpret mode picks index 3, the chip picked 17).
    # Two-pass min is tie-robust by construction: min value, then min
    # index among exact minima.
    T, K = dist.shape
    m = jnp.min(dist, axis=1, keepdims=True)                    # (T, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    cand = jnp.where(dist <= m, idx, K)
    code = jnp.min(cand, axis=1, keepdims=True)
    # An all-NaN distance row leaves cand all-K (dist <= m is False for
    # NaN); emit code 0 rather than the out-of-range sentinel K, which
    # downstream gathers would silently clamp to the last codebook row.
    out_ref[:] = jnp.where(code >= K, 0, code)


def _pallas_argmin(z: jnp.ndarray, codebook: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    N, d = z.shape
    K = codebook.shape[0]
    d_pad = ((d + LANE - 1) // LANE) * LANE
    n_pad = ((N + TILE_N - 1) // TILE_N) * TILE_N

    zp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:N, :d].set(z)
    ct = jnp.zeros((d_pad, K), jnp.float32).at[:d, :].set(codebook.T)
    csq = jnp.sum(codebook * codebook, axis=1)[None, :]         # (1, K)

    grid = (n_pad // TILE_N,)
    out = pl.pallas_call(
        _argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * K,
            bytes_accessed=(n_pad * d_pad + d_pad * K + n_pad) * 4,
            transcendentals=0),
    )(zp, ct, csq)
    return out[:N, 0]


def _jnp_argmin(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    dist = (jnp.sum(z * z, axis=1, keepdims=True)
            - 2.0 * jnp.dot(z, codebook.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(codebook * codebook, axis=1)[None, :])
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def codebook_argmin(z: jnp.ndarray, codebook: jnp.ndarray,
                    use_pallas: bool | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Nearest codebook row (first-min tie-break) for each query.

    Args:
      z: (N, d) float32 queries (already L2-normalized if cosine search).
      codebook: (K, d) float32.
    Returns:
      (N,) int32 codes.
    """
    z = z.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    if use_pallas is None:
        import os
        env = os.environ.get("ESC_TPU_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false", "")
        else:
            use_pallas = jax.default_backend() == "tpu"
    if use_pallas or interpret:
        # int codes carry no gradient (the straight-through estimator
        # routes grads around the lookup); stop_gradient keeps autodiff
        # from trying to linearize through the pallas_call.
        z = jax.lax.stop_gradient(z)
        codebook = jax.lax.stop_gradient(codebook)
        return _pallas_argmin(z, codebook, interpret=interpret)
    return _jnp_argmin(z, codebook)
