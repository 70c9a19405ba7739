"""Adversarial-stage stability artifact (VERDICT r2 item 2).

The GAN path has one-step golden parity vs a torch mirror
(tests/test_torch_parity_disc.py); this proves it *trains* without
divergence: run a codebook-freeze warmup followed by a few-hundred-step
adversarial stage with the reference recipe — weights mel 15 / gen 1 /
feat 2 (configs/9kbps_esc_base_adv.yaml, mirroring the reference
esc/scripts/trainer_adv.py:61-113), clips 1e3 (gen) / 10 (disc) — and
record the loss/quality trajectory.

Output: tests/golden/adv_trajectory.json, asserted by
tests/test_adv_stability.py (losses bounded, no NaN, MelDistance not
degraded by the adversarial stage).

Run: python tools/adv_trajectory.py [--init-ckpt trained.ckpt]  (TPU)
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

DISC_CONFIG = dict(
    sample_rate=16000, rates=[], periods=[2, 3, 5, 7, 11],
    fft_sizes=[2048, 1024, 512],
    bands=[[0.0, 0.1], [0.1, 0.25], [0.25, 0.5], [0.5, 0.75], [0.75, 1.0]],
)


def run_adv_trajectory(data_dir: str, pretrain_steps: int = 100,
                       adv_steps: int = 300, eval_every: int = 50,
                       lr: float = 1e-4, seed: int = 11,
                       init_ckpt: str | None = None,
                       model_config: dict | None = None,
                       disc_config: dict | None = None,
                       batch_size: int = 8,
                       save_ckpt: str | None = None,
                       dropout_rate: float = 0.5,
                       corpus_desc: str =
                       "16 noise-free harmonic clips (make_corpus noise=0)",
                       save_every: int | None = None,
                       slim_save: bool = False,
                       val_dir: str | None = None,
                       ) -> Dict:
    import jax
    import jax.numpy as jnp

    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.train.data import quantization_dropout
    from esc_tpu.train.trainer_adv import TrainerAdv
    from esc_tpu.utils import dict2namespace
    from tools.quality_longrun import BASE_CONFIG

    model_cfg = model_config or BASE_CONFIG
    config = dict2namespace({
        "data": {"train_data_path": data_dir,
                 "val_data_path": val_dir or data_dir,
                 "num_workers": 0, "train_bs_per_device": batch_size,
                 "val_bs_per_device": batch_size},
        "model_name": "csvq+swinT",
        "model": model_cfg,
        "discriminator": disc_config or DISC_CONFIG,
        # reference adversarial weights (configs/9kbps_esc_base_adv.yaml)
        "loss": {"stft_weight": 0.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 15.0, "gen_weight": 1.0, "feat_weight": 2.0},
    })
    args = argparse.Namespace(
        exp_name="advtraj", lr=lr, num_epochs=1, num_pretraining_epochs=0,
        num_warmup_steps=0, val_metric="SISDR", scheduler_type="constant",
        dropout_rate=dropout_rate, pretrain_ckp=None, log_steps=10 ** 9,
        save_path=None, seed=seed)

    trainer = TrainerAdv(config, args, devices=jax.devices()[:1])
    model, train_dl, val_dl = trainer.load()
    params = model.variables["params"]
    if init_ckpt:
        from esc_tpu.checkpoint import restore_into
        payload = restore_into(init_ckpt,
                               model_state_target=jax.device_get(params))
        params = jax.tree_util.tree_map(jnp.asarray,
                                        payload["model_state_dict"])
        print(f"resumed generator from {init_ckpt}", flush=True)
    state = (params, trainer.tx.init(params), trainer.disc_params,
             trainer.tx_disc.init(trainer.disc_params))
    step_fn = trainer._make_step_fn(model.module)

    batches = [jax.device_put(b) for b in train_dl]
    eval_batch = (np.asarray(list(val_dl)[0]) if val_dir
                  else np.asarray(jax.device_get(batches[0])))
    mel_fn, sdr_fn = MelSpectrogramDistance(), SISDR()
    from esc_tpu.metrics_pesq import pesq_wb
    drop_rng = np.random.default_rng(seed)
    ns_max = model_cfg["max_streams"]
    best = {"PESQ": -1.0, "step": -1}  # val-PESQ checkpoint selection,
    # mirroring the reference trainers' best-ckpt-by-val-PESQ
    # (/root/reference/scripts/trainer_no_adv.py:147-149)

    def evaluate(p, step, stage, aux=None) -> Dict:
        model.variables = {"params": p}
        out = model(eval_batch, None, num_streams=ns_max)
        recon = np.asarray(out["recon_audio"])
        row: Dict = {
            "step": step, "stage": stage,
            "MelDistance": round(float(np.mean(mel_fn(eval_batch, recon))),
                                 3),
            "SISDR": round(float(np.mean(sdr_fn(eval_batch, recon))), 3),
            "PESQ": round(float(np.mean(
                [pesq_wb(r, d) for r, d in
                 zip(eval_batch[:8], recon[:8])])), 3),
        }
        if aux is not None:
            for k in ("mel_loss", "gen_loss", "feat_loss", "disc_loss"):
                row[k] = round(float(np.asarray(aux[k])), 5)
        return row

    def save_now(st, step) -> None:
        # periodic save: a wall-clock kill must not lose the run.
        # slim_save keeps only generator params (~33 MB vs ~600 MB with
        # disc + both optimizer states) — the durable artifact; full
        # state stays opt-in for true resume.
        if not save_ckpt:
            return
        from esc_tpu.checkpoint import save_checkpoint
        extra = None if slim_save else {
            "model_disc_state_dict": jax.device_get(st[2]),
            "optimizer_disc_state_dict": jax.device_get(st[3])}
        save_checkpoint(os.path.dirname(save_ckpt) or ".",
                        os.path.basename(save_ckpt),
                        step=step,
                        model_state=jax.device_get(st[0]),
                        optimizer_state=None if slim_save
                        else jax.device_get(st[1]),
                        scheduler_state={"type": "constant", "step": step},
                        best_perf=-1.0,
                        extra=extra)
        print(f"adv params saved to {save_ckpt} at step {step}", flush=True)

    traj: List[Dict] = []
    aux = None
    total = pretrain_steps + adv_steps
    for step in range(total):
        freeze = step < pretrain_steps
        stage = "pretrain" if freeze else "adv"
        if not freeze and step == pretrain_steps:
            # generator optimizer renewal at the stage switch
            state = (state[0], trainer.tx.init(state[0]), state[2],
                     state[3])
            if pretrain_steps % eval_every != 0:
                # when eval_every divides pretrain_steps this step was
                # already logged by the boundary branch below
                traj.append(evaluate(state[0], step, "pretrain", aux))
                print(json.dumps(traj[-1]), flush=True)
        ns = jnp.asarray(
            ns_max if freeze else
            quantization_dropout(args.dropout_rate, ns_max, drop_rng),
            jnp.int32)
        state, aux = step_fn(state, batches[step % len(batches)], ns,
                             freeze=freeze)
        if (step + 1) % eval_every == 0 or step + 1 == total:
            traj.append(evaluate(state[0], step + 1, stage, aux))
            print(json.dumps(traj[-1]), flush=True)
            if save_ckpt and traj[-1]["PESQ"] > best["PESQ"]:
                best.update(PESQ=traj[-1]["PESQ"], step=step + 1)
                from esc_tpu.checkpoint import save_checkpoint
                save_checkpoint(os.path.dirname(save_ckpt) or ".",
                                os.path.basename(save_ckpt) + ".best",
                                step=step + 1,
                                model_state=jax.device_get(state[0]),
                                optimizer_state=None,
                                scheduler_state={"type": "constant",
                                                 "step": step + 1},
                                best_perf=best["PESQ"])
                print(f"new best val PESQ {best['PESQ']} at {step + 1}; "
                      f"saved {save_ckpt}.best", flush=True)
        # checkpoint cadence decoupled from eval cadence: the full-state
        # device_get + msgpack write is hundreds of MB — at eval_every=50
        # it would dominate step time on long runs
        if ((step + 1) % (save_every or eval_every) == 0
                or step + 1 == total):
            save_now(state, step + 1)
    return {
        "backend": jax.default_backend(),
        "seed": seed,
        "pretrain_steps": pretrain_steps,
        "adv_steps": adv_steps,
        "lr": lr,
        "init_ckpt": init_ckpt,
        "weights": "mel 15 / gen 1 / feat 2 / cm 0.25 / cb 1 "
                   "(configs/9kbps_esc_base_adv.yaml), clips 1e3 gen / "
                   "10 disc",
        "config": ("ESC-Base" if model_config is None else "custom")
                  + " + MPD/MRD discriminator",
        "dropout_rate": dropout_rate,
        "corpus": corpus_desc,
        "eval_on": "held-out val corpus" if val_dir else "train batch 0",
        "best_val_pesq": best["PESQ"],
        "best_val_pesq_step": best["step"],
        "pesq_backend": "numpy-p862 (NOT comparable to ITU C-lib values; "
                        "see esc_tpu/metrics_pesq.py + test_pesq "
                        "calibration battery)",
        "trajectory": traj,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain-steps", type=int, default=100)
    p.add_argument("--adv-steps", type=int, default=300)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--init-ckpt", type=str, default=None)
    p.add_argument("--out", type=str, default=GOLDEN)
    p.add_argument("--save-ckpt", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=8,
                   help="smaller batches shrink the fused gen+disc step "
                        "graph (this environment's compile helper OOMs "
                        "on the B=8 adversarial graph)")
    p.add_argument("--dropout-rate", type=float, default=0.5,
                   help="quantization-dropout rate during the adv stage "
                        "(the paper recipe uses 0.75)")
    p.add_argument("--corpus", choices=("harmonic", "speechlike"),
                   default="harmonic",
                   help="harmonic: 16 noise-free clips (the r2 stability "
                        "golden); speechlike: 32 source-filter clips "
                        "(tools/speech_corpus.py), the corpus the "
                        "speechA/B non-adv runs trained on")
    p.add_argument("--n-clips", type=int, default=None,
                   help="train corpus size (speechlike only; default 32)")
    p.add_argument("--val-seed", type=int, default=None,
                   help="HELD-OUT val corpus seed (speechlike only); the "
                        "trajectory then evaluates on unseen clips")
    p.add_argument("--val-clips", type=int, default=64)
    p.add_argument("--save-every", type=int, default=None,
                   help="checkpoint cadence in steps (default: every "
                        "eval boundary)")
    p.add_argument("--slim-save", action="store_true",
                   help="save generator params only (~33 MB) instead of "
                        "the full ~600 MB gen+disc+optimizer state")
    a = p.parse_args(argv)
    with tempfile.TemporaryDirectory() as d, \
            tempfile.TemporaryDirectory() as dv:
        val_dir = None
        if a.corpus == "speechlike":
            from tools.speech_corpus import make_speech_corpus
            n = a.n_clips or 32
            make_speech_corpus(d, n_clips=n)
            corpus_desc = (f"{n} speech-like source-filter clips "
                           "(speech_corpus.py seed 7)")
            if a.val_seed is not None:
                assert a.val_seed != 7, "val seed must differ from train"
                make_speech_corpus(dv, n_clips=a.val_clips, seed=a.val_seed)
                val_dir = dv
                corpus_desc += (f"; held-out val: {a.val_clips} clips "
                                f"seed {a.val_seed}")
        else:
            from tools.quality_trajectory import make_corpus
            make_corpus(d, noise=0.0)
            corpus_desc = ("16 noise-free harmonic clips "
                           "(make_corpus noise=0)")
        result = run_adv_trajectory(
            d, pretrain_steps=a.pretrain_steps, adv_steps=a.adv_steps,
            eval_every=a.eval_every, lr=a.lr, init_ckpt=a.init_ckpt,
            batch_size=a.batch_size, save_ckpt=a.save_ckpt,
            dropout_rate=a.dropout_rate, corpus_desc=corpus_desc,
            save_every=a.save_every, slim_save=a.slim_save,
            val_dir=val_dir)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"adversarial trajectory written to {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
