"""From-scratch trainability at a FIXED low stream count.

Round-4 diagnostic test for the low-bitrate cliff (DESIGN.md §9c):
``artifacts/diag_ns3.json`` showed that fine-tuning a ns=6-specialized
checkpoint at fixed ns=3 leaves the train loss flat for 20k steps. This
test pins the complementary fact — training the SAME architecture at
fixed ns=1 (deepest stream only, all other streams zero-masked as in
/root/reference/esc/models/csrvq.py:43-45) FROM SCRATCH reduces the
loss several-fold within a few hundred steps — so gradients flow
through the masked-stream decode path and the diag_ns3 stall is an
optimization trap of the specialized init, not a broken low-ns graph.
"""

import argparse

import numpy as np
import pytest

import jax

from esc_tpu.train.data import save_wav
from esc_tpu.utils import dict2namespace


@pytest.fixture(scope="module")
def two_clip_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("ns1_wavs")
    sr = 16000
    for i in range(2):
        t = np.arange(8000) / sr
        f0 = 120 + 60 * i
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.15 * np.sin(2 * np.pi * 3 * f0 * t))
        save_wav(str(d / f"clip_{i}.wav"), x.astype(np.float32))
    return str(d)


@pytest.mark.slow
def test_fixed_ns1_from_scratch_learns(two_clip_folder):
    from esc_tpu.train.trainer import Trainer
    from tests.test_model_shapes import TINY_CONFIG

    config = dict2namespace({
        "data": {"train_data_path": two_clip_folder,
                 "val_data_path": two_clip_folder,
                 "num_workers": 0, "train_bs_per_device": 2,
                 "val_bs_per_device": 2},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    })
    args = argparse.Namespace(
        exp_name="ns1_scratch", lr=1e-3, num_epochs=1,
        num_pretraining_epochs=0, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.0, pretrain_ckp=None,
        log_steps=10 ** 9, save_path=None, seed=11)

    trainer = Trainer(config, args, devices=jax.devices()[:1])
    model, train_dl, _ = trainer.load()
    params = model.variables["params"]
    state = (params, trainer.tx.init(params))
    step_fn = trainer._make_step_fn(model.module)
    batch = next(iter(train_dl))

    first = None
    for step in range(1, 501):
        state, aux = step_fn(state, batch, num_streams=1, freeze=False)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])

    assert np.isfinite(first) and np.isfinite(last)
    # prototype calibration (2026-08-18, CPU): 17.2 -> 7.2 by step 400,
    # 6.5 by step 600; 2x is a comfortable margin for seed variation
    assert last < 0.5 * first, (first, last)
