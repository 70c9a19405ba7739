"""Train-step golden parity for the generator path vs the torch mirror.

One step, fixed converted weights and a fixed batch: per-sample
cm/cb/mel/stft losses and full parameter gradients must agree between the
JAX model and the torch mirror in both the codebook-freeze pretraining
stage and the main stage (scripts/trainer_no_adv.py:95-124 semantics:
per-sample losses weighted then .mean(), STE through the quantizers,
freeze-stage zeroing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esc_tpu.convert import flax_to_torch, torch_to_flax
from esc_tpu.models import ESC
from esc_tpu.modules.losses import complex_stft_loss, mel_spectrogram_loss
from tests import torch_mirror as tm
from tests.test_torch_parity import CONFIG

L = 4720  # T=60 frames
W = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    mirror = tm.ESCMirror(**CONFIG)
    mirror.train()
    model = ESC(**CONFIG)
    model.init_params(example_len=L)
    model.variables = torch_to_flax(mirror.state_dict(), model.variables)
    return mirror, model


@pytest.fixture(scope="module")
def batch(pair):
    rng = np.random.default_rng(21)
    return (0.1 * rng.standard_normal((2, L))).astype(np.float32)


def _torch_step(mirror, x, num_streams, freeze):
    """Losses use the full reference weighting; the backward for the grad
    check excludes the complex-STFT term: its power-law compression has
    unbounded curvature at zero (d|s|^0.3/ds ~ |s|^-0.7, up to ~1e7 at
    eps), so cross-framework full-model fp32 grad comparison through it is
    ill-posed — torch fp32-vs-fp64 against ITSELF shows cos(grad) ~0.79.
    Its backward semantics are pinned in isolation below at identical
    inputs, where the comparison is well-conditioned.
    """
    mirror.zero_grad()
    out = mirror(torch.from_numpy(x), num_streams, freeze)
    mel = tm.mel_spectrogram_loss(out["raw_audio"], out["recon_audio"])
    stft_l = tm.complex_stft_loss(out["raw_feat"], out["recon_feat"])
    total = (out["cm_loss"] * W["cm"] + out["cb_loss"] * W["cb"]
             + mel * W["mel"] + stft_l * W["stft"]).mean()
    grad_total = (out["cm_loss"] * W["cm"] + out["cb_loss"] * W["cb"]
                  + mel * W["mel"]).mean()
    grad_total.backward()
    grads = {n: p.grad.detach().numpy().copy()
             for n, p in mirror.named_parameters() if p.grad is not None}
    return {"cm": out["cm_loss"].detach().numpy(),
            "cb": out["cb_loss"].detach().numpy(),
            "mel": mel.detach().numpy(),
            "stft": stft_l.detach().numpy(),
            "total": float(total.detach()), "grads": grads}


def _jax_step(model, x, num_streams, freeze):
    module = model.module

    def loss_fn(params):
        out = module.apply({"params": params}, jnp.asarray(x), None,
                           num_streams, freeze, True)
        mel = mel_spectrogram_loss(out["raw_audio"], out["recon_audio"])
        stft_l = complex_stft_loss(out["raw_feat"], out["recon_feat"])
        grad_total = (out["cm_loss"] * W["cm"] + out["cb_loss"] * W["cb"]
                      + mel * W["mel"]).mean()
        total = grad_total + (stft_l * W["stft"]).mean()
        return grad_total, (out["cm_loss"], out["cb_loss"], mel, stft_l,
                            total)

    # jit: un-jitted eager grad of the full model is ~2 min of per-op
    # dispatch on one CPU core; the compiled graph persists in the
    # suite's compilation cache across runs.
    (_, (cm, cb, mel, stft_l, total)), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(model.variables["params"])
    return {"cm": np.asarray(cm), "cb": np.asarray(cb),
            "mel": np.asarray(mel), "stft": np.asarray(stft_l),
            "total": float(total),
            "grads": flax_to_torch({"params": grads})}


@pytest.mark.parametrize("num_streams,freeze", [(6, True), (3, False)])
def test_trainstep_losses_and_grads(pair, batch, num_streams, freeze):
    mirror, model = pair
    ref = _torch_step(mirror, batch, num_streams, freeze)
    ours = _jax_step(model, batch, num_streams, freeze)

    if freeze:  # pretraining: VQ losses exactly zero on both sides
        assert np.all(ref["cm"] == 0.0) and np.all(ours["cm"] == 0.0)
        assert np.all(ref["cb"] == 0.0) and np.all(ours["cb"] == 0.0)
    else:
        np.testing.assert_allclose(ours["cm"], ref["cm"], rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(ours["cb"], ref["cb"], rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(ours["mel"], ref["mel"], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(ours["stft"], ref["stft"], rtol=5e-4,
                               atol=1e-6)
    np.testing.assert_allclose(ours["total"], ref["total"], rtol=5e-4,
                               atol=5e-5)

    # gradient agreement, leaf by leaf (torch key layout via flax_to_torch)
    t_grads = ref["grads"]
    j_grads = ours["grads"]
    checked = 0
    sq_num = sq_den = 0.0
    for k, tg in t_grads.items():
        jg = j_grads.get(k)
        assert jg is not None, f"missing jax grad for {k}"
        assert jg.shape == tg.shape, k
        tn, jn = np.linalg.norm(tg), np.linalg.norm(jg)
        sq_num += float(np.sum((jg - tg) ** 2))
        sq_den += float(np.sum(tg ** 2))
        if tn > 1e-8 and jn > 1e-8:
            cos = float(np.dot(tg.ravel(), jg.ravel()) / (tn * jn))
            # per-leaf 0.995: the mel log term (1/x near clamp_eps) leaves
            # a little fp32 cross-framework noise on low-norm leaves; the
            # global rel-L2 bound below stays tight.
            assert cos > 0.995, (k, cos)
            checked += 1
    assert checked > 50  # every layer participates
    rel_l2 = (sq_num / (sq_den + 1e-30)) ** 0.5
    # The mel loss is L1 on spectrograms: its gradient is sign(xm - ym),
    # so bins where the two frameworks' fp32 forwards straddle a tie flip
    # the per-bin gradient outright. torch-vs-torch fp32/fp64 self-noise
    # is 2e-5 here; the cross-framework budget below covers the tie flips
    # (measured ~1.8%) while still catching any structural divergence.
    assert rel_l2 < 5e-2, rel_l2


def test_complex_stft_loss_grad_isolated(rng):
    """power_law backward parity at identical inputs (well-posed: no
    model divergence to amplify; both sides differentiate the same
    bits)."""
    raw = rng.standard_normal((2, 2, 24, 30)).astype(np.float32)
    rec = (raw + 0.1 * rng.standard_normal(raw.shape)).astype(np.float32)

    tr = torch.from_numpy(rec).requires_grad_(True)
    tm.complex_stft_loss(torch.from_numpy(raw), tr).sum().backward()
    t_grad = tr.grad.numpy()

    j_grad = np.asarray(jax.grad(
        lambda r: jnp.sum(complex_stft_loss(jnp.asarray(raw), r)))(
            jnp.asarray(rec)))
    np.testing.assert_allclose(j_grad, t_grad, rtol=1e-4,
                               atol=1e-6 * np.abs(t_grad).max())
