"""Data-driven codebook initialization (k-means++ / sampling).

The reference ships this as dead code (esc/modules/vq/initialize.py is
never imported; SURVEY §2 "Codebook data-init"). Here it is a working
opt-in feature: run the encoder over a warmup batch, collect the
pre-quantization latents per (scale, group), and re-initialize each
codebook from them — either by uniform sampling or a few k-means
iterations (jit-compiled, distances as MXU matmuls).

Usage:
    variables = kmeans_init_codebooks(model, warmup_batch, iters=10)
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans", "sample_centroids", "kmeans_init_codebooks"]


@functools.partial(jax.jit, static_argnums=(2, 3))
def kmeans(points: jnp.ndarray, seed: jnp.ndarray, k: int,
           iters: int) -> jnp.ndarray:
    """Plain Lloyd k-means on (N, d) points -> (k, d) centroids.

    Init by random sampling; empty clusters keep their previous
    centroid. Distance matrix is an (N, k) matmul per iteration.
    """
    N, d = points.shape
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, N, (k,), replace=N < k)
    init = points[idx]

    def step(centroids, _):
        dist = (jnp.sum(points ** 2, 1, keepdims=True)
                - 2.0 * points @ centroids.T
                + jnp.sum(centroids ** 2, 1)[None, :])
        assign = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=points.dtype)  # (N, k)
        counts = onehot.sum(0)                                   # (k,)
        sums = onehot.T @ points                                 # (k, d)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids


def sample_centroids(points: np.ndarray, k: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Uniform-sample k rows (with replacement if needed)."""
    idx = rng.choice(points.shape[0], k, replace=points.shape[0] < k)
    return points[idx]


def kmeans_init_codebooks(model, batch: np.ndarray, iters: int = 10,
                          seed: int = 0) -> Dict:
    """Re-initialize every product-VQ codebook of an ESC wrapper from the
    encoder latents of ``batch``. Returns (and installs) new variables.

    Mirrors the intent of the reference's unused
    ``codebook_init_forward_hook_pvq`` (initialize.py:7-34): each
    codebook is fit on the down-projected residual latents it will
    quantize, at max bitrate.
    """
    model._ensure_init()
    module = model.module

    def collect(variables, x):
        """Replicates the cross-scale residual path, returning each
        codebook's down-projected inputs (csrvq.py:97-129)."""

        def run(mod):
            feat = None
            from ..ops.stft import spec_transform
            feat = spec_transform(x, mod.in_freq, mod.win_len, mod.hop_len,
                                  mod.sr)
            enc_hs, shape = mod.encoder(feat, training=False)
            latents = {}
            dec = 0.0
            H, W = shape
            # quantizer 0 and 1 both act at the bottom scale; decoder
            # block i-1 upsamples AFTER quantizer i's refinement
            # (csrvq.py:111-124).
            for i in range(mod.max_streams):
                vq = mod.quantizers[i]
                enc = enc_hs[-1] if i <= 1 else enc_hs[-i]
                residual = enc - dec
                from ..modules.vq import pre_process
                z = pre_process(residual, vq.in_freq, vq.overlap, vq.fix_dim)
                s = 0
                for g in range(vq.num_vqs):
                    z_g = vq.down_projs[g](z[..., s:s + vq.vq_dims[g]])
                    latents[(i, g)] = z_g.reshape(-1, vq.codebook_dim)
                    s += vq.vq_dims[g]
                out = vq(residual, freeze_vq=False, training=False)
                dec = out["z_q"] + dec
                if 1 <= i < mod.max_streams - 1:
                    if mod.backbone == "convolution":
                        dec = mod.decoder.blocks[i - 1](dec, False)
                    else:
                        dec, H, W = mod.decoder.blocks[i - 1](dec, H, W)
            return latents

        return module.apply(variables, method=run)

    latents = jax.jit(collect)(model.variables, jnp.asarray(batch))

    params = jax.device_get(model.variables["params"])
    for (i, g), z in latents.items():
        z = jnp.asarray(z, jnp.float32)
        vq_params = params[f"quantizers_{i}"][f"vqs_{g}"]
        k = vq_params["embedding"].shape[0]
        cents = kmeans(z, jnp.int32(seed + 31 * i + g), k, iters)
        if model.config.get("l2norm", True):
            # keep centroid scale comparable to kaiming init under cosine
            # lookup: normalize then rescale to the mean latent norm
            norm = jnp.linalg.norm(cents, axis=1, keepdims=True).clip(1e-8)
            cents = cents / norm * jnp.mean(
                jnp.linalg.norm(z, axis=1))
        vq_params["embedding"] = np.asarray(cents, dtype=np.float32)
    model.variables = {**model.variables, "params": params}
    return model.variables
