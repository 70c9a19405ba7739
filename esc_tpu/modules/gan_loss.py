"""LS-GAN discriminator/generator losses + feature matching.

Mirrors esc/modules/loss/gan_loss.py with per-sample ``(B,)`` reductions
(mean over feature-map dims). Functional: the discriminator module and
its params are passed in, so the trainer controls which side gets
gradients (fake is stop-gradient'd for the discriminator step, real
fmaps are stop-gradient'd in feature matching — the reference's
``.detach()`` calls, gan_loss.py:31,50).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

__all__ = ["discriminator_loss", "generator_loss", "GANLoss"]


def _mean_fmap(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean over all non-batch dims."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def discriminator_loss(disc_apply, disc_params, fake: jnp.ndarray,
                       real: jnp.ndarray) -> jnp.ndarray:
    """LS-GAN D loss (gan_loss.py:30-37), per-sample ``(B,)``."""
    d_fake = disc_apply(disc_params, jax.lax.stop_gradient(fake))
    d_real = disc_apply(disc_params, real)
    loss = 0.0
    for f, r in zip(d_fake, d_real):
        loss += _mean_fmap(f[-1] ** 2)
        loss += _mean_fmap((1.0 - r[-1]) ** 2)
    return loss


def generator_loss(disc_apply, disc_params, fake: jnp.ndarray,
                   real: jnp.ndarray):
    """LS-GAN G loss + L1 feature matching (gan_loss.py:39-51).

    Returns (gen_loss, feat_loss), both per-sample ``(B,)``. Gradients
    flow into ``fake`` only (disc params are held constant by the caller
    taking grad w.r.t. generator params).
    """
    d_fake = disc_apply(disc_params, fake)
    d_real = disc_apply(disc_params, real)
    gen = 0.0
    for f in d_fake:
        gen += _mean_fmap((1.0 - f[-1]) ** 2)
    feat = 0.0
    for f_maps, r_maps in zip(d_fake, d_real):
        for f, r in zip(f_maps[:-1], r_maps[:-1]):
            feat += _mean_fmap(jnp.abs(f - jax.lax.stop_gradient(r)))
    return gen, feat


class GANLoss:
    """Stateful wrapper mirroring the reference class interface
    (gan_loss.py:5): holds a Discriminator module + params."""

    def __init__(self, discriminator_module, params: Any):
        self.module = discriminator_module
        self.params = params
        self._apply = jax.jit(
            lambda p, x: discriminator_module.apply({"params": p}, x))

    def discriminator_loss(self, fake, real):
        return discriminator_loss(self._apply, self.params, fake, real)

    def generator_loss(self, fake, real):
        return generator_loss(self._apply, self.params, fake, real)
