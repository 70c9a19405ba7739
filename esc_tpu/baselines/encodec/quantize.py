"""EnCodec residual vector quantizer (plain, unfactorized).

Unlike DAC's RVQ (esc_tpu/baselines/dac/quantize.py) there are no
in/out projections: codebooks live directly in the 128-d latent space,
euclidean nearest-neighbour, quantized residuals summed. Matches the
inference semantics of the torch ``ResidualVectorQuantizer`` the
reference compares against (baselines/descript/dac/compare/encodec.py
loads it via the ``encodec`` package).

Training note: the torch implementation learns codebooks by k-means EMA;
here the training path exposes a straight-through estimator plus
commitment loss (the esc_tpu house style — see esc_tpu/modules/vq.py),
with ``esc_tpu.modules.vq_init`` available for k-means (re)seeding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["EncodecRVQ"]


class EncodecRVQ(nn.Module):
    """Residual VQ over (B, T, D) latents.

    codebooks param: (n_q, bins, dim) — layer q's table is
    ``codebooks[q]`` (torch key ``quantizer.vq.layers.{q}._codebook.embed``).
    """

    n_q: int = 32
    bins: int = 1024
    dim: int = 128

    def setup(self):
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(stddev=1.0),
            (self.n_q, self.bins, self.dim))

    def _nearest(self, residual: jnp.ndarray, table: jnp.ndarray):
        """argmin_j ||r - e_j||^2 via the expanded form (one MXU GEMM)."""
        dot = jnp.dot(residual, table.T,
                      preferred_element_type=jnp.float32)  # (B,T,bins)
        e2 = jnp.sum(table * table, axis=-1)
        codes = jnp.argmin(e2[None, None] - 2.0 * dot, axis=-1)
        return codes, table[codes]

    def encode(self, z: jnp.ndarray, n_q: int | None = None) -> jnp.ndarray:
        """(B, T, D) -> codes (B, n_q, T) int32."""
        n_q = self.n_q if n_q is None else n_q
        residual = z
        out = []
        for q in range(n_q):
            codes, quant = self._nearest(residual, self.codebooks[q])
            residual = residual - quant
            out.append(codes)
        return jnp.stack(out, axis=1).astype(jnp.int32)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, n_q, T) -> summed latents (B, T, D)."""
        n_q = codes.shape[1]
        quant = self.codebooks[jnp.arange(n_q)[None, :, None],
                               codes]          # (B, n_q, T, D)
        return jnp.sum(quant, axis=1)

    def __call__(self, z: jnp.ndarray, n_q: int | None = None,
                 training: bool = False):
        """Quantize with straight-through; returns (zq, codes, commit)."""
        n_q = self.n_q if n_q is None else n_q
        residual = z
        zq = jnp.zeros_like(z)
        all_codes = []
        commit = jnp.zeros((z.shape[0],), z.dtype)
        for q in range(n_q):
            codes, quant = self._nearest(residual, self.codebooks[q])
            all_codes.append(codes)
            if training:
                # pull the (pre-quant) residual toward its codeword
                commit = commit + jnp.mean(
                    (residual - jax.lax.stop_gradient(quant)) ** 2,
                    axis=(1, 2))
            zq = zq + quant
            residual = residual - quant
        if training:
            zq = z + jax.lax.stop_gradient(zq - z)  # STE
        codes = jnp.stack(all_codes, axis=1).astype(jnp.int32)
        return zq, codes, commit
