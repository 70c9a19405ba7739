"""Adversarial training-step regression: generator + discriminator both
update, GAN terms gated off during pretraining, losses finite.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esc_tpu.utils import dict2namespace
from tests.test_model_shapes import TINY_CONFIG
from tests.test_training import wav_folder  # fixture  # noqa: F401


@pytest.fixture(scope="module")
def adv_trainer(wav_folder):  # noqa: F811
    from esc_tpu.train.trainer_adv import TrainerAdv
    config = dict2namespace({
        "data": {"train_data_path": wav_folder, "val_data_path": wav_folder,
                 "num_workers": 0, "train_bs_per_device": 1,
                 "val_bs_per_device": 2},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "discriminator": {"sample_rate": 16000, "rates": [],
                          "periods": [2, 3], "fft_sizes": [512, 256],
                          "bands": [[0.0, 0.25], [0.25, 1.0]]},
        "loss": {"stft_weight": 0.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 15.0, "gen_weight": 1.0, "feat_weight": 2.0},
    })
    args = argparse.Namespace(
        exp_name="tiny_adv", lr=4e-4, num_epochs=2,
        num_pretraining_epochs=1, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.5, pretrain_ckp=None,
        log_steps=1000, save_path=None, seed=3)
    # 2 devices: exercises the DP shard/replicate path at a quarter of
    # the 8-device execution cost on one CPU core (DP-vs-single-device
    # numeric equivalence is covered by tests/test_parallel.py).
    t = TrainerAdv(config, args, devices=jax.devices()[:2])
    model, train_dl, _ = t.load()
    return t, model, train_dl


@pytest.mark.slow  # 80 s 2-device GAN-step integration; the adv step
# stays default-covered by test_resume.py's TrainerAdv resume test
def test_adv_step(adv_trainer):
    t, model, train_dl = adv_trainer
    params = model.variables["params"]
    state = t.dp.replicate((params, t.tx.init(params), t.disc_params,
                            t.tx_disc.init(t.disc_params)))
    step_fn = t._make_step_fn(model.module)
    batch = t.dp.shard(next(iter(train_dl)))

    # pretraining: GAN terms must be exactly zero
    state, aux = step_fn(state, batch, jnp.int32(6), freeze=True)
    assert float(aux["gen_loss"]) == 0.0
    assert float(aux["feat_loss"]) == 0.0
    assert float(aux["disc_loss"]) == 0.0

    d_before = jax.tree_util.tree_leaves(state[2])[0].copy()
    # main stage: both sides update, all losses finite
    state, aux = step_fn(state, batch, jnp.int32(4), freeze=False)
    for k in ("loss", "gen_loss", "feat_loss", "disc_loss", "mel_loss"):
        assert np.isfinite(float(aux[k])), (k, aux[k])
    assert float(aux["gen_loss"]) > 0.0
    assert float(aux["disc_loss"]) > 0.0
    d_after = jax.tree_util.tree_leaves(state[2])[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))
