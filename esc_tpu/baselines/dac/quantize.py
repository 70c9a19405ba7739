"""DAC residual VQ: factorized (low-dim) L2-normalized codebook lookup
with per-sample quantizer dropout.

Re-design of baselines/descript/dac/nn/quantize.py. Layout is
channels-last ``(B, T, C)``; the nearest-neighbor search reuses the
framework's Pallas/jnp codebook_argmin (cosine distance — both sides
L2-normalized, quantize.py:82-92).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pallas.vq_kernels import codebook_argmin
from .layers import WNConv1d

__all__ = ["VectorQuantize", "ResidualVectorQuantize"]


class VectorQuantize(nn.Module):
    """Single VQ with 1x1 in/out projections and a factorized codebook
    (quantize.py:13-94)."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = WNConv1d(self.codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(self.input_dim, kernel_size=1)
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim))

    def decode_latents(self, latents: jnp.ndarray, training: bool = False):
        """(B, T, d) projected latents -> (z_q, indices); cosine NN.

        Pallas search on TPU inference; identical jnp path in training
        graphs (differentiable composition).
        """
        B, T, d = latents.shape
        z = latents.reshape(-1, d)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-12)
        cb = self.codebook / jnp.linalg.norm(
            self.codebook, axis=-1, keepdims=True).clip(1e-12)
        idx = codebook_argmin(z, cb,
                              use_pallas=False if training else None)
        idx = idx.reshape(B, T)
        return jnp.take(self.codebook, idx, axis=0), idx

    def decode_code(self, code: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.codebook, code, axis=0)

    def __call__(self, z: jnp.ndarray, training: bool = False):
        """z (B, T, C) -> (z_q, commitment (B,), codebook (B,), codes,
        latents) (quantize.py:34-70)."""
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e, training=training)
        sg = jax.lax.stop_gradient
        commitment = jnp.mean((z_e - sg(z_q)) ** 2, axis=(1, 2))
        codebook_l = jnp.mean((z_q - sg(z_e)) ** 2, axis=(1, 2))
        z_q = z_e + sg(z_q - z_e)  # straight-through
        z_q = self.out_proj(z_q)
        return z_q, commitment, codebook_l, indices, z_e


class ResidualVectorQuantize(nn.Module):
    """RVQ with per-sample quantizer-dropout mask during training
    (quantize.py:97-198). ``n_quantizers`` may be an int (eval) or a
    per-sample ``(B,)`` array (training, sampled by the trainer)."""

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0

    @property
    def _dims(self) -> List[int]:
        d = self.codebook_dim
        return [d] * self.n_codebooks if isinstance(d, int) else list(d)

    def setup(self):
        self.quantizers = [
            VectorQuantize(self.input_dim, self.codebook_size, dim,
                           name=f"quantizers_{i}")
            for i, dim in enumerate(self._dims)]

    def __call__(self, z: jnp.ndarray,
                 n_quantizers: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """z (B, T, C) -> (z_q, codes (B,N,T), latents (B,T,sum d),
        commitment, codebook) — losses are scalars (DAC convention,
        unlike ESC's per-sample)."""
        z_q = 0.0
        residual = z
        commitment = 0.0
        codebook_l = 0.0
        codes, latents = [], []

        B = z.shape[0]
        if n_quantizers is None:
            n_q = jnp.full((B,), self.n_codebooks, jnp.float32)
        else:
            n_q = jnp.asarray(n_quantizers, jnp.float32)
            n_q = jnp.broadcast_to(n_q, (B,))

        n_loop = self.n_codebooks
        if not training and isinstance(n_quantizers, int):
            n_loop = n_quantizers  # eval early-exit (quantize.py:174-175)

        for i in range(n_loop):
            z_q_i, cm_i, cb_i, idx_i, z_e_i = self.quantizers[i](
                residual, training=training)
            mask = (jnp.float32(i) < n_q).astype(jnp.float32)  # (B,)
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i
            commitment += jnp.mean(cm_i * mask)
            codebook_l += jnp.mean(cb_i * mask)
            codes.append(idx_i)
            latents.append(z_e_i)

        return (z_q, jnp.stack(codes, axis=1),
                jnp.concatenate(latents, axis=-1), commitment, codebook_l)

    def sample_dropout(self, rng, batch: int) -> jnp.ndarray:
        """Per-sample n_quantizers for training (quantize.py:166-171):
        the first ``B*quantizer_dropout`` samples get uniform {1..N},
        the rest use all codebooks."""
        full = jnp.full((batch,), self.n_codebooks + 1, jnp.int32)
        drop = jax.random.randint(rng, (batch,), 1, self.n_codebooks + 1)
        n_dropout = int(batch * self.quantizer_dropout)
        return jnp.concatenate([drop[:n_dropout], full[n_dropout:]])

    def from_codes(self, codes: jnp.ndarray):
        """codes (B, N, T) -> (z_q, latents, codes) (quantize.py:200-220)."""
        z_q = 0.0
        z_ps = []
        for i in range(codes.shape[1]):
            z_p_i = self.quantizers[i].decode_code(codes[:, i])
            z_ps.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_ps, axis=-1), codes

    def from_latents(self, latents: jnp.ndarray):
        """latents (B, T, sum d) -> (z_q, z_p, codes) (quantize.py:222-255)."""
        z_q = 0.0
        z_ps, codes = [], []
        s = 0
        dims = self._dims
        n = 0
        total = latents.shape[-1]
        acc = 0
        for d in dims:
            if acc + d > total:
                break
            acc += d
            n += 1
        for i in range(n):
            d = dims[i]
            z_p_i, code_i = self.quantizers[i].decode_latents(
                latents[..., s:s + d])
            z_ps.append(z_p_i)
            codes.append(code_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
            s += d
        return z_q, jnp.concatenate(z_ps, axis=-1), jnp.stack(codes, axis=1)
