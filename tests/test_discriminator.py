"""Shape & gradient tests for the MPD/MSD/MRD discriminator + GAN loss.

Golden references for exact outputs would need audiotools; here we pin
the structural contract (fmap counts/shapes, per-sample loss shapes,
finite grads both sides) that the adversarial trainer depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esc_tpu.models.discriminator import Discriminator, MPD, MRD
from esc_tpu.modules.gan_loss import discriminator_loss, generator_loss

L = 7920  # short clip


@pytest.fixture(scope="module")
def disc():
    # smaller fft sizes to keep CPU compile fast; same structure
    module = Discriminator(periods=(2, 3), fft_sizes=(512, 256),
                           sample_rate=16000)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, L), jnp.float32))["params"]
    return module, params


def test_fmap_structure(disc, rng):
    module, params = disc
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    fmaps = module.apply({"params": params}, x)
    assert len(fmaps) == 2 + 2  # 2 MPD + 2 MRD
    for maps in fmaps:
        assert len(maps) == 6  # 5 conv stages + post  (MRD: 25+1 -> 26)
        break  # MPD layout
    # MRD: 5 bands x 5 convs + 1 post
    assert len(fmaps[2]) == 26
    for maps in fmaps:
        for m in maps:
            assert m.ndim == 4 and m.shape[0] == 2
            assert np.isfinite(np.asarray(m)).all()
    # logits are single-channel
    assert fmaps[0][-1].shape[-1] == 1


def test_gan_losses_per_sample_and_grads(rng):
    # single-period/single-fft disc + ONE jitted program for all four
    # quantities: the behaviors under test (per-sample shapes, grad
    # flow) don't depend on the stack width, and this keeps the CPU
    # compile small
    module = Discriminator(periods=(2,), fft_sizes=(256,),
                           sample_rate=16000)
    Ls = 2640
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, Ls), jnp.float32))["params"]
    real = jnp.asarray(rng.standard_normal((2, Ls)).astype(np.float32))
    fake = jnp.asarray(0.5 * rng.standard_normal((2, Ls)).astype(np.float32))

    def apply(p, x):
        return module.apply({"params": p}, x)

    @jax.jit
    def all_quantities(params, fake, real):
        d_loss = discriminator_loss(apply, params, fake, real)
        g_loss, f_loss = generator_loss(apply, params, fake, real)
        g = jax.grad(lambda p: discriminator_loss(apply, p, fake,
                                                  real).mean())(params)
        gx = jax.grad(lambda x: sum(generator_loss(apply, params, x, real)
                                    ).mean())(fake)
        return d_loss, g_loss, f_loss, g, gx

    d_loss, g_loss, f_loss, g, gx = all_quantities(params, fake, real)
    assert d_loss.shape == (2,)
    assert g_loss.shape == (2,) and f_loss.shape == (2,)
    # disc grads flow and are finite
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    # generator grads flow through fake only
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gx).sum()) > 0
