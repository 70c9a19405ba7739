"""Trained-weights evidence for the bfloat16 serving mode.

Trains the tiny codec (the quality-trajectory harness) and evaluates the
SAME trained float32 weights with float32 vs bfloat16 compute dtype.
Writes tests/golden/bf16_quality.json; tests/test_bf16_mode.py asserts
the committed deltas stay small.

Run on the TPU chip:  python tools/bf16_quality.py --steps 400
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "bf16_quality.json")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--out", type=str, default=OUT)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.models import ESC
    from tests.test_model_shapes import TINY_CONFIG
    from tools.quality_trajectory import make_corpus

    with tempfile.TemporaryDirectory() as d:
        corpus = os.path.join(d, "corpus")
        make_corpus(corpus)
        import argparse as ap

        import jax

        from esc_tpu.train.data import quantization_dropout
        from esc_tpu.train.trainer import Trainer
        from esc_tpu.utils import dict2namespace

        config = dict2namespace({
            "data": {"train_data_path": corpus, "val_data_path": corpus,
                     "num_workers": 0, "train_bs_per_device": 8,
                     "val_bs_per_device": 8},
            "model_name": "csvq+swinT",
            "model": TINY_CONFIG,
            "loss": {"stft_weight": 1.0, "cm_weight": 0.25,
                     "cb_weight": 1.0, "mel_weight": 0.25},
        })
        targs = ap.Namespace(
            exp_name="bf16q", lr=4e-4, num_epochs=1,
            num_pretraining_epochs=0, num_warmup_steps=0,
            val_metric="SISDR", scheduler_type="constant",
            dropout_rate=0.5, pretrain_ckp=None, log_steps=10 ** 9,
            save_path=None, seed=11)
        trainer = Trainer(config, targs, devices=jax.devices()[:1])
        model, train_dl, _ = trainer.load()
        params = model.variables["params"]
        state = (params, trainer.tx.init(params))
        step_fn = trainer._make_step_fn(model.module)
        batches = list(train_dl)
        eval_batch = batches[0]
        drop_rng = np.random.default_rng(11)
        pretrain = 40
        for step in range(args.steps):
            freeze = step < pretrain
            s = (TINY_CONFIG["max_streams"] if freeze
                 else quantization_dropout(0.5, TINY_CONFIG["max_streams"],
                                           drop_rng))
            state, _ = step_fn(state, batches[step % len(batches)],
                               num_streams=s, freeze=freeze)
            if step + 1 == pretrain:
                state = (state[0], trainer.tx.init(state[0]))

        trained = jax.device_get(state[0])
        mel_fn, sdr_fn = MelSpectrogramDistance(), SISDR()
        out = {}
        for label, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            m = ESC(**TINY_CONFIG, dtype=dtype)
            m.variables = {"params": trained}
            _, _, recon = m.roundtrip(eval_batch,
                                      num_streams=TINY_CONFIG["max_streams"])
            recon = np.asarray(recon)
            out[label] = {
                "MelDistance": round(float(np.mean(mel_fn(eval_batch,
                                                          recon))), 4),
                "SISDR": round(float(np.mean(sdr_fn(eval_batch, recon))), 4),
            }
        art = {"backend": jax.default_backend(), "steps": args.steps,
               "config": "TINY_CONFIG", **out}
    os.makedirs(os.path.dirname(os.path.normpath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    sys.exit(main())
