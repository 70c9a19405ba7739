"""Adversarial-stage stability artifact (VERDICT r2 item 2).

Runs the REAL TrainerAdv step (generator update with reference weights
mel 15 / gen 1 / feat 2, clip 1e3; discriminator update, clip 10 —
reference: scripts/trainer_adv.py:61-113) for a pretraining stage plus a
few hundred adversarial steps on the deterministic synthetic corpus, and
records the loss/quality trajectory. The committed golden
(tests/golden/adv_trajectory.json) is asserted by
tests/test_adv_stability.py: disc/gen losses bounded, no NaN anywhere,
and quality (MelDistance) not degraded vs the pretrain endpoint.

Run `python tools/adv_trajectory.py` to regenerate (TPU or CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from typing import Dict, List

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "adv_trajectory.json")

DISC_TINY = {
    "sample_rate": 16000,
    "rates": [],          # reference adv config disables MSD
    "periods": [2, 3],
    "fft_sizes": [512, 256],
    "bands": [[0.0, 0.1], [0.1, 0.25], [0.25, 0.5], [0.5, 0.75],
              [0.75, 1.0]],
}


def run_adv_trajectory(data_dir: str, pretrain_steps: int = 100,
                       adv_steps: int = 300, eval_every: int = 50,
                       seed: int = 11) -> Dict:
    import jax
    import jax.numpy as jnp

    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.train.data import quantization_dropout
    from esc_tpu.train.trainer_adv import TrainerAdv
    from esc_tpu.utils import dict2namespace
    from tests.test_model_shapes import TINY_CONFIG

    config = dict2namespace({
        "data": {"train_data_path": data_dir, "val_data_path": data_dir,
                 "num_workers": 0, "train_bs_per_device": 8,
                 "val_bs_per_device": 8},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "discriminator": DISC_TINY,
        # reference adversarial weights (configs/9kbps_esc_base_adv.yaml)
        "loss": {"stft_weight": 0.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 15.0, "gen_weight": 1.0, "feat_weight": 2.0},
    })
    args = argparse.Namespace(
        exp_name="adv_traj", lr=1e-4, num_epochs=1,
        num_pretraining_epochs=0, num_warmup_steps=0, val_metric="SISDR",
        scheduler_type="constant", dropout_rate=0.5, pretrain_ckp=None,
        log_steps=10 ** 9, save_path=None, seed=seed)

    trainer = TrainerAdv(config, args, devices=jax.devices()[:1])
    model, train_dl, _ = trainer.load()
    params = model.variables["params"]
    state = (params, trainer.tx.init(params), trainer.disc_params,
             trainer.tx_disc.init(trainer.disc_params))
    step_fn = trainer._make_step_fn(model.module)

    batches = list(train_dl)
    eval_batch = batches[0]
    mel_fn, sdr_fn = MelSpectrogramDistance(), SISDR()
    drop_rng = np.random.default_rng(seed)
    ns_max = TINY_CONFIG["max_streams"]

    def evaluate(p) -> Dict[str, float]:
        model.variables = {"params": p}
        out = model(eval_batch, None, num_streams=ns_max)
        recon = np.asarray(out["recon_audio"])
        return {"MelDistance": round(float(np.mean(mel_fn(eval_batch,
                                                          recon))), 4),
                "SISDR": round(float(np.mean(sdr_fn(eval_batch, recon))), 4)}

    traj: List[Dict] = []
    total = pretrain_steps + adv_steps
    for step in range(total):
        batch = batches[step % len(batches)]
        freeze = step < pretrain_steps
        s = (ns_max if freeze else
             quantization_dropout(args.dropout_rate, ns_max, drop_rng))
        if step == pretrain_steps:
            # generator optimizer renewal at the stage switch
            state = (state[0], trainer.tx.init(state[0]), state[2], state[3])
        state, aux = step_fn(state, batch, num_streams=jnp.int32(s),
                             freeze=freeze)
        if (step + 1) % eval_every == 0 or step + 1 == pretrain_steps \
                or step == 0:
            row = dict(step=step + 1, stage="pretrain" if freeze else "adv",
                       gen_loss=round(float(aux["gen_loss"]), 4),
                       feat_loss=round(float(aux["feat_loss"]), 4),
                       disc_loss=round(float(aux["disc_loss"]), 4),
                       mel_loss=round(float(aux["mel_loss"]), 4),
                       loss=round(float(aux["loss"]), 4),
                       **evaluate(state[0]))
            traj.append(row)
            print(json.dumps(row), flush=True)
    return {
        "backend": __import__("jax").default_backend(),
        "seed": seed,
        "pretrain_steps": pretrain_steps,
        "adv_steps": adv_steps,
        "weights": "mel 15 / gen 1 / feat 2, clips 1e3/10 (reference)",
        "config": "TINY_CONFIG + tiny MPD/MRD discriminator",
        "trajectory": traj,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain-steps", type=int, default=100)
    p.add_argument("--adv-steps", type=int, default=300)
    p.add_argument("--out", type=str, default=GOLDEN)
    a = p.parse_args(argv)
    from tools.quality_trajectory import make_corpus
    with tempfile.TemporaryDirectory() as d:
        make_corpus(d)
        result = run_adv_trajectory(d, pretrain_steps=a.pretrain_steps,
                                    adv_steps=a.adv_steps)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"golden adversarial trajectory written to {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
