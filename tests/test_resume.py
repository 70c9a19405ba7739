"""Resume is a true continuation: training N steps, checkpointing, and
resuming reproduces the uninterrupted run exactly — weights, optimizer
moments, host RNG (quantization dropout), and data order all restored
(reference layout: scripts/trainer_no_adv.py:152-162, trainer_adv.py:160-172).
"""

import argparse

import jax
import numpy as np
import pytest

from esc_tpu.utils import dict2namespace
from tests.test_model_shapes import TINY_CONFIG
from tests.test_training import wav_folder  # fixture  # noqa: F401

# identical to tests/test_trainer_adv.py's fixture config so the two
# modules share ONE compiled adversarial step (same module, disc, loss
# weights, optimizer -> same _STEP_FN_CACHE entry and jit executable)
DISC_CONFIG = {"sample_rate": 16000, "rates": [], "periods": [2, 3],
               "fft_sizes": [512, 256],
               "bands": [[0.0, 0.25], [0.25, 1.0]]}


def _config(wav_folder, adv=False):
    d = {
        "data": {"train_data_path": wav_folder, "val_data_path": wav_folder,
                 "num_workers": 0, "train_bs_per_device": 1,
                 "val_bs_per_device": 2},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    }
    if adv:
        d["discriminator"] = DISC_CONFIG
        d["loss"] = {"stft_weight": 0.0, "cm_weight": 0.25,
                     "cb_weight": 1.0, "mel_weight": 15.0,
                     "gen_weight": 1.0, "feat_weight": 2.0}
    return dict2namespace(d)


def _args(save_path, num_epochs, resume=False, seed=11):
    # num_pretraining_epochs=0: resume semantics don't depend on the
    # codebook-freeze stage (covered by test_training /
    # test_torch_parity_trainstep), and skipping it avoids compiling the
    # freeze=True train-step variant in this file
    return argparse.Namespace(
        exp_name="resume_test", lr=4e-4, num_epochs=num_epochs,
        num_pretraining_epochs=0, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.5, pretrain_ckp=None,
        log_steps=1000, save_path=str(save_path), seed=seed, resume=resume)


def _leaves(tree):
    return [np.asarray(l) for l in jax.tree_util.tree_leaves(tree)]


def test_resume_matches_uninterrupted(wav_folder, tmp_path):  # noqa: F811
    from esc_tpu.train.trainer import Trainer

    # Run A: 4 epochs (8 steps, 2/epoch) uninterrupted.
    ta = Trainer(_config(wav_folder), _args(tmp_path / "a", 4))
    state_a = ta.train()

    # Run B: 2 epochs, then resume to 4 with a fresh Trainer.
    tb1 = Trainer(_config(wav_folder), _args(tmp_path / "b", 2))
    tb1.train()
    tb2 = Trainer(_config(wav_folder), _args(tmp_path / "b", 4, resume=True))
    state_b = tb2.train()
    assert tb2.start_step == 4  # resumed exactly after the last step

    for a, b in zip(_leaves(state_a[0]), _leaves(state_b[0])):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # optimizer moments continue too (Adam mu/nu + schedule count)
    for a, b in zip(_leaves(state_a[1]), _leaves(state_b[1])):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_checkpoint_carries_full_state(wav_folder, tmp_path):  # noqa: F811
    from esc_tpu.checkpoint import load_checkpoint
    from esc_tpu.train.trainer import Trainer

    t = Trainer(_config(wav_folder), _args(tmp_path, 2))
    t.train()
    payload = load_checkpoint(str(tmp_path / "resume_test/checkpoint.ckpt"))
    assert payload["step"] == 3  # last completed step index
    assert len(jax.tree_util.tree_leaves(payload["optimizer_state_dict"])) > 0
    assert isinstance(payload["rng_state"], str) and payload["rng_state"]
    assert payload["scheduler_state_dict"]["type"] == "constant"


@pytest.mark.slow
def test_adv_resume_restores_disc(wav_folder, tmp_path):  # noqa: F811
    from esc_tpu.checkpoint import load_checkpoint
    from esc_tpu.train.trainer_adv import TrainerAdv

    t1 = TrainerAdv(_config(wav_folder, adv=True), _args(tmp_path, 2))
    state1 = t1.train()
    disc_after = _leaves(state1[2])

    payload = load_checkpoint(str(tmp_path / "resume_test/checkpoint.ckpt"))
    assert len(jax.tree_util.tree_leaves(
        payload["optimizer_disc_state_dict"])) > 0

    # saved disc state equals the live end-of-run state
    for a, b in zip(disc_after, _leaves(payload["model_disc_state_dict"])):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

    t2 = TrainerAdv(_config(wav_folder, adv=True),
                    _args(tmp_path, 3, resume=True))
    state2 = t2.train()
    assert t2.start_step == 4
    # the resumed run trains on from the saved discriminator (not re-init)
    assert np.isfinite(_leaves(state2[0])[0]).all()
    assert np.isfinite(_leaves(state2[2])[0]).all()
