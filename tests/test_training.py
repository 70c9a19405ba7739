"""Training-step regression on a tiny model with synthetic data:
loss decreases, grads finite, pretraining (codebook-freeze) stage
switches, quantization dropout samples, DP step runs on the 8-device
CPU mesh (SURVEY §4e).
"""

import os

import numpy as np
import pytest

from esc_tpu.train.data import save_wav, quantization_dropout


@pytest.fixture(scope="module")
def wav_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(7)
    sr = 16000
    for i in range(16):
        t = np.arange(8000) / sr  # 7920 after trim -> T=100 frames (even)
        f0 = 100 + 40 * i
        x = 0.3 * np.sin(2 * np.pi * f0 * t) \
            + 0.05 * rng.standard_normal(t.shape)
        save_wav(str(d / f"clip_{i}.wav"), x.astype(np.float32))
    return str(d)


def test_quantization_dropout_distribution():
    rng = np.random.default_rng(0)
    vals = [quantization_dropout(0.75, 6, rng) for _ in range(400)]
    assert set(vals) <= set(range(1, 7))
    assert vals.count(6) > 100      # 25% no-dropout + uniform share
    assert min(vals) == 1


def test_loader_worker_error_propagates(wav_folder, tmp_path):
    """A corrupt wav must raise in the consumer, not silently shrink the
    epoch (VERDICT r2 item 6: _Prefetcher swallowed worker exceptions)."""
    import shutil
    from esc_tpu.train.data import make_dataloader

    d = tmp_path / "corrupt"
    shutil.copytree(wav_folder, d)
    (d / "clip_3.wav").write_bytes(b"RIFFgarbage-not-a-wav")

    dl = make_dataloader(str(d), batch_size=4, shuffle=False,
                         num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in dl:
            pass


@pytest.mark.slow  # 70 s multi-step integration; step correctness is
# default-covered by test_resume / test_parallel / torch_parity_trainstep
def test_train_steps_decrease_loss(wav_folder):
    import argparse
    from esc_tpu.train.trainer import Trainer
    from esc_tpu.utils import dict2namespace
    from tests.test_model_shapes import TINY_CONFIG

    config = dict2namespace({
        "data": {"train_data_path": wav_folder, "val_data_path": wav_folder,
                 "num_workers": 0, "train_bs_per_device": 1,
                 "val_bs_per_device": 2},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    })
    args = argparse.Namespace(
        exp_name="tiny_test", lr=4e-4, num_epochs=3,
        num_pretraining_epochs=1, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.5, pretrain_ckp=None,
        log_steps=1000, save_path=None, seed=11)

    trainer = Trainer(config, args)
    assert trainer.dp.num_devices == 8  # virtual CPU mesh from conftest

    model, train_dl, val_dl = trainer.load()
    params = model.variables["params"]
    opt_state = trainer.tx.init(params)
    state = trainer.dp.replicate((params, opt_state))
    step_fn = trainer._make_step_fn(model.module)

    batch = next(iter(train_dl))
    assert batch.shape == (8, 7920)
    batch = trainer.dp.shard(batch)

    # pretraining (freeze) stage: cb/cm losses must be exactly zero
    state, aux = step_fn(state, batch, num_streams=6, freeze=True)
    assert float(aux["cb_loss"]) == 0.0 and float(aux["cm_loss"]) == 0.0
    first = float(aux["loss"])
    assert np.isfinite(first)

    # main stage: losses finite, loss decreases over a few repeated steps
    losses = []
    for _ in range(6):
        state, aux = step_fn(state, batch, num_streams=3, freeze=False)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses

    # params actually moved and stayed finite
    p = jax_leaves_finite(state[0])
    assert p


@pytest.mark.slow  # 56 s; the scan path is also exercised every round
# by the longrun tools whose goldens test_quality_trajectory asserts
def test_multi_step_scan_matches_single_steps(wav_folder):
    """make_multi_step (K steps per dispatch via lax.scan) must be
    numerically identical to K sequential single-step dispatches."""
    import argparse

    import jax
    import jax.numpy as jnp

    from esc_tpu.train.trainer import Trainer, make_multi_step
    from esc_tpu.utils import dict2namespace
    from tests.test_model_shapes import TINY_CONFIG

    config = dict2namespace({
        "data": {"train_data_path": wav_folder, "val_data_path": wav_folder,
                 "num_workers": 0, "train_bs_per_device": 4,
                 "val_bs_per_device": 4},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    })
    args = argparse.Namespace(
        exp_name="scan_test", lr=4e-4, num_epochs=1,
        num_pretraining_epochs=0, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.5, pretrain_ckp=None,
        log_steps=10 ** 9, save_path=None, seed=11)
    trainer = Trainer(config, args, devices=jax.devices()[:1])
    model, train_dl, _ = trainer.load()
    # host copy: both paths donate their state buffers, so each needs a
    # fresh device tree
    p0 = jax.device_get(model.variables["params"])
    step_fn = trainer._make_step_fn(model.module)

    batches = next(iter(train_dl))
    K = 3
    stacked = np.stack([batches] * K)
    ns = np.asarray([6, 3, 6], np.int32)

    def fresh_state():
        p = jax.tree_util.tree_map(jnp.asarray, p0)
        return (p, trainer.tx.init(p))

    multi = make_multi_step(step_fn.core, freeze=False)

    # strict: a K=1 scan equals one single-step dispatch
    s1, aux1 = step_fn(fresh_state(), batches, num_streams=jnp.int32(6),
                       freeze=False)
    s2, auxs1 = multi(fresh_state(), jnp.asarray(stacked[:1]),
                      jnp.asarray(ns[:1]) * 0 + 6)
    np.testing.assert_allclose(float(np.asarray(auxs1["loss"])[0]),
                               float(aux1["loss"]), rtol=1e-5, atol=1e-6)

    # bounded drift over K=3: XLA fuses the scan body differently from
    # the standalone step; float reassociation noise passes through
    # Adam's normalizer as at most ~lr-sized per-element update flips,
    # so the trajectories agree to lr-scale, not ulp-scale.
    state1 = fresh_state()
    for i in range(K):
        state1, aux1 = step_fn(state1, batches,
                               num_streams=jnp.int32(int(ns[i])),
                               freeze=False)
    state2, auxs = multi(fresh_state(), jnp.asarray(stacked),
                         jnp.asarray(ns))
    assert np.asarray(auxs["loss"]).shape == (K,)
    np.testing.assert_allclose(float(np.asarray(auxs["loss"])[-1]),
                               float(aux1["loss"]), rtol=5e-3)
    lr = 4e-4
    for a, b in zip(jax.tree_util.tree_leaves(state1[0]),
                    jax.tree_util.tree_leaves(state2[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3 * K * lr)


def jax_leaves_finite(tree):
    import jax
    return all(bool(np.isfinite(np.asarray(l)).all())
               for l in jax.tree_util.tree_leaves(tree))
