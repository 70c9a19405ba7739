"""Golden numeric parity for the adversarial stack vs the torch mirror:
discriminator feature maps (MPD / MSD rate-1 / MRD match-stride STFT),
LS-GAN generator/feature/discriminator losses, and the gradient of the
generator-side adversarial loss w.r.t. the fake waveform.

Weights flow torch -> flax through esc_tpu.convert (weight_norm
weight_g/weight_v -> WeightNorm scale/kernel), so this also pins the
converter's discriminator coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esc_tpu.convert import torch_to_flax
from esc_tpu.models.discriminator import Discriminator
from esc_tpu.modules.gan_loss import discriminator_loss, generator_loss
from tests import torch_mirror_adv as tm

B, L = 2, 4000
CFG = dict(rates=(1,), periods=(2, 3), fft_sizes=(512, 256),
           sample_rate=16000)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(5)
    mirror = tm.Discriminator(**{**CFG, "rates": [1],
                                 "periods": list(CFG["periods"]),
                                 "fft_sizes": list(CFG["fft_sizes"])})
    mirror.eval()
    flax_disc = Discriminator(**CFG)
    rng = jax.random.PRNGKey(0)
    variables = flax_disc.init(rng, jnp.zeros((1, L), jnp.float32))
    variables = torch_to_flax(mirror.state_dict(), variables)
    return mirror, flax_disc, variables["params"]


def _to_flax_layout(t):
    t = t.detach().numpy()
    if t.ndim == 4:                     # NCHW -> NHWC
        return t.transpose(0, 2, 3, 1)
    return t.transpose(0, 2, 1)[:, None]  # MSD (B,C,W) -> (B,1,W,C)


def test_fmap_parity(pair, rng):
    mirror, flax_disc, params = pair
    x = 0.5 * rng.standard_normal((B, L)).astype(np.float32)
    ours = flax_disc.apply({"params": params}, jnp.asarray(x))
    theirs = mirror(torch.from_numpy(x).unsqueeze(1))
    assert len(ours) == len(theirs) == 5  # 2 MPD + 1 MSD + 2 MRD
    for di, (fl, tl) in enumerate(zip(ours, theirs)):
        assert len(fl) == len(tl), di
        for li, (f, t) in enumerate(zip(fl, tl)):
            ref = _to_flax_layout(t)
            np.testing.assert_allclose(
                np.asarray(f), ref, rtol=2e-3, atol=2e-4,
                err_msg=f"disc {di} fmap {li}")


def test_msd_resampled_fmap_parity(rng):
    """MSD at rates [2, 4]: the julius-exact input resampler + conv
    stack match the torch mirror (VERDICT r2 item 5 — the reference
    resamples via audiotools, esc/models/discriminator.py:87-89)."""
    torch.manual_seed(7)
    mirror = tm.Discriminator(rates=[2, 4], periods=[], fft_sizes=[],
                              sample_rate=16000)
    mirror.eval()
    flax_disc = Discriminator(rates=(2, 4), periods=(), fft_sizes=(),
                              sample_rate=16000)
    variables = flax_disc.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, L), jnp.float32))
    variables = torch_to_flax(mirror.state_dict(), variables)
    x = 0.5 * rng.standard_normal((B, L)).astype(np.float32)
    ours = flax_disc.apply({"params": variables["params"]}, jnp.asarray(x))
    theirs = mirror(torch.from_numpy(x).unsqueeze(1))
    assert len(ours) == len(theirs) == 2
    for di, (fl, tl) in enumerate(zip(ours, theirs)):
        assert len(fl) == len(tl) == 7, di
        for li, (f, t) in enumerate(zip(fl, tl)):
            np.testing.assert_allclose(
                np.asarray(f), _to_flax_layout(t), rtol=2e-3, atol=2e-4,
                err_msg=f"MSD rate disc {di} fmap {li}")


def test_mrd_spectrogram_matches_audiotools_semantics(rng):
    """Isolates the match_stride STFT: flax MRD.spectrogram vs
    torch.stft-based audiotools reconstruction (float64 reference)."""
    x = rng.standard_normal((B, L)).astype(np.float32)
    w = 512
    mrd = Discriminator(**CFG)  # only to reuse module defs
    del mrd
    from esc_tpu.models.discriminator import MRD
    m = MRD(window_length=w)
    bands = m.spectrogram(jnp.asarray(x))

    s = tm.match_stride_stft(torch.from_numpy(x).double().unsqueeze(1), w)
    s = torch.view_as_real(s).permute(0, 3, 2, 1).numpy()  # (B, 2, T, F)
    n_fft = w // 2 + 1
    refs = [s[..., int(lo * n_fft):int(hi * n_fft)] for lo, hi in tm.BANDS]
    assert len(bands) == len(refs)
    for bi, (b, r) in enumerate(zip(bands, refs)):
        # flax layout (B, T, F, 2) vs ref (B, 2, T, F)
        np.testing.assert_allclose(
            np.asarray(b), r.transpose(0, 2, 3, 1), rtol=1e-4, atol=2e-3,
            err_msg=f"band {bi}")


def test_gan_losses_parity(pair, rng):
    mirror, flax_disc, params = pair
    fake = 0.3 * rng.standard_normal((B, L)).astype(np.float32)
    real = 0.3 * rng.standard_normal((B, L)).astype(np.float32)

    gan = tm.GANLoss(mirror)
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    t_d = gan.discriminator_loss(tf, tr).detach().numpy()
    t_g, t_feat = gan.generator_loss(tf, tr)
    t_g, t_feat = t_g.detach().numpy(), t_feat.detach().numpy()

    def apply(p, x):
        return flax_disc.apply({"params": p}, x)

    j_d = np.asarray(jax.jit(discriminator_loss, static_argnums=0)(
        apply, params, jnp.asarray(fake), jnp.asarray(real)))
    j_g, j_feat = jax.jit(generator_loss, static_argnums=0)(
        apply, params, jnp.asarray(fake), jnp.asarray(real))
    np.testing.assert_allclose(j_d, t_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_g), t_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat, rtol=1e-3,
                               atol=1e-4)


def test_generator_adv_gradient_parity(pair, rng):
    """d(gen+feat)/d(fake) agrees with torch — the gradient that actually
    trains the generator in the adversarial stage."""
    mirror, flax_disc, params = pair
    fake = 0.3 * rng.standard_normal((B, L)).astype(np.float32)
    real = 0.3 * rng.standard_normal((B, L)).astype(np.float32)

    tf = torch.from_numpy(fake).requires_grad_(True)
    gan = tm.GANLoss(mirror)
    g, f = gan.generator_loss(tf, torch.from_numpy(real))
    (g.sum() + f.sum()).backward()
    t_grad = tf.grad.numpy()

    def apply(p, x):
        return flax_disc.apply({"params": p}, x)

    def loss_fn(fk):
        g, f = generator_loss(apply, params, fk, jnp.asarray(real))
        return jnp.sum(g) + jnp.sum(f)

    # jit: eager per-op grad of the 3-discriminator stack costs >1 min
    # of dispatch on one core; the compiled graph persists in the cache.
    j_grad = np.asarray(jax.jit(jax.grad(loss_fn))(jnp.asarray(fake)))
    cos = np.dot(t_grad.ravel(), j_grad.ravel()) / (
        np.linalg.norm(t_grad) * np.linalg.norm(j_grad) + 1e-12)
    assert cos > 0.9999, cos
    np.testing.assert_allclose(j_grad, t_grad, rtol=5e-3,
                               atol=5e-4 * np.abs(t_grad).max())
