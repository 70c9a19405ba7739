"""Waveform-fidelity golden run (VERDICT r2 item 1): train ESC-Base
with the REAL recipe (codebook-freeze pretrain -> quantization-dropout
main stage) long enough that SI-SDR goes decisively positive, and
record the trajectory at two bitrates.

Uses the lax.scan multi-step path (esc_tpu.train.trainer.make_multi_step)
so a 100k-step run is minutes on one chip instead of dispatch-bound
hours. Corpus is the deterministic harmonic corpus WITHOUT the i.i.d.
noise floor (see tools/quality_trajectory.make_corpus: after power-law
compression an i.i.d. floor dominates the loss and starves the
phase-carrying bins of gradient; real speech has no such component).

Output: tests/golden/quality_longrun.json, asserted by
tests/test_quality_trajectory.py::test_longrun_golden_sisdr_positive.

Run: python tools/quality_longrun.py  (TPU; ~10-20 min)
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
                      "quality_longrun.json")

BASE_CONFIG = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[45, 72, 96, 144, 192, 384], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[3, 6, 12, 24, 24], swin_depth=2, window_size=4,
    mlp_ratio=4.0, overlap=2, group_size=3, codebook_size=1024,
    codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
)


def run_longrun(data_dir: str, total_steps: int = 100_000,
                pretrain_steps: int = 10_000, scan: int = 1000,
                eval_every: int = 10_000, lr: float = 4e-4,
                seed: int = 11, eval_streams=(6, 3),
                init_ckpt: str | None = None,
                save_ckpt: str | None = None,
                mode: str = "loop",
                fixed_ns: int | None = None,
                corpus_desc: str =
                "16 noise-free harmonic clips (make_corpus noise=0)",
                dropout_rate: float = 0.75,
                enc_precision: str | None = None,
                dec_precision: str | None = None,
                val_dir: str | None = None,
                batch_size: int = 8,
                ) -> Dict:
    import jax
    import jax.numpy as jnp

    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.train.data import quantization_dropout
    from esc_tpu.train.trainer import Trainer, make_multi_step
    from esc_tpu.utils import dict2namespace

    model_cfg = dict(BASE_CONFIG)
    if enc_precision:
        model_cfg["enc_precision"] = enc_precision
    if dec_precision:
        model_cfg["dec_precision"] = dec_precision
    config = dict2namespace({
        "data": {"train_data_path": data_dir,
                 "val_data_path": val_dir or data_dir,
                 "num_workers": 0, "train_bs_per_device": batch_size,
                 "val_bs_per_device": batch_size},
        "model_name": "csvq+swinT",
        "model": model_cfg,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    })
    # dropout_rate 0.75 is the reference PAPER recipe (README.md:43
    # --dropout_rate 0.75); the r1-r3 longruns ran 0.5, halving
    # reduced-stream training pressure — a prime suspect in the
    # ns<6 collapse (artifacts/bitrate_curves.json (stageC): the decoder
    # routed everything through the last stream).
    args = argparse.Namespace(
        exp_name="longrun", lr=lr, num_epochs=1, num_pretraining_epochs=0,
        num_warmup_steps=0, val_metric="SISDR", scheduler_type="constant",
        dropout_rate=dropout_rate, pretrain_ckp=None, log_steps=10 ** 9,
        save_path=None, seed=seed)

    trainer = Trainer(config, args, devices=jax.devices()[:1])
    model, train_dl, val_dl = trainer.load()
    params = model.variables["params"]
    if init_ckpt:
        from esc_tpu.checkpoint import restore_into
        payload = restore_into(init_ckpt,
                               model_state_target=jax.device_get(params))
        params = jax.tree_util.tree_map(jnp.asarray,
                                        payload["model_state_dict"])
        print(f"resumed params from {init_ckpt}", flush=True)
    state = (params, trainer.tx.init(params))
    step_fn = trainer._make_step_fn(model.module)

    batches = list(train_dl)  # fixed batches, cycled in order
    # evaluate on HELD-OUT data when a separate val corpus is given —
    # a trainset eval on a small memorized corpus says nothing about the
    # codec (artifacts/bitrate_curves.json (speechB_heldout): -30 dB SI-SDR
    # held-out vs +24 dB trainset on the r4 checkpoint)
    eval_batch = list(val_dl)[0] if val_dir else batches[0]
    mel_fn, sdr_fn = MelSpectrogramDistance(), SISDR()
    drop_rng = np.random.default_rng(seed)
    ns_max = BASE_CONFIG["max_streams"]

    def evaluate(p, step) -> Dict:
        model.variables = {"params": p}
        row: Dict = {"step": step}
        for s in eval_streams:
            out = model(eval_batch, None, num_streams=s)
            recon = np.asarray(out["recon_audio"])
            row[f"SISDR@{s}"] = round(
                float(np.mean(sdr_fn(eval_batch, recon))), 3)
            row[f"MelDist@{s}"] = round(
                float(np.mean(mel_fn(eval_batch, recon))), 3)
        return row

    K = scan
    traj: List[Dict] = [evaluate(state[0], 0)]
    print(json.dumps(traj[0]), flush=True)
    done = 0

    if mode == "scan":
        stacked = jax.device_put(np.stack(
            [batches[i % len(batches)] for i in range(K)]))  # (K, B, L)
        multi_pre = make_multi_step(step_fn.core, freeze=True)
        multi_main = make_multi_step(step_fn.core, freeze=False)
        ns_pre = jnp.full((K,), ns_max, jnp.int32)
    else:
        # Single-step async dispatch: everything device-resident, never
        # block between evals. Fetch-verified timing shows this and the
        # lax.scan path at the same ms/step (tools/diag_scanspeed.py);
        # loop avoids the K-step scan graph's multi-minute compile and
        # 254MB cache entry, scan avoids per-step dispatch overhead on
        # slower hosts — pick per use.
        dev_batches = [jax.device_put(b) for b in batches]
        ns_consts = {i: jax.device_put(jnp.asarray(i, jnp.int32))
                     for i in range(1, ns_max + 1)}

    while done < total_steps:
        freeze = done < pretrain_steps
        if not freeze and done == pretrain_steps:
            # optimizer renewal at the stage switch (trainer.py)
            state = (state[0], trainer.tx.init(state[0]))
        if mode == "scan":
            if freeze:
                state, auxs = multi_pre(state, stacked, ns_pre)
            else:
                ns_arr = jnp.asarray(
                    [fixed_ns if fixed_ns is not None else
                     quantization_dropout(args.dropout_rate, ns_max,
                                          drop_rng)
                     for _ in range(K)], jnp.int32)
                state, auxs = multi_main(state, stacked, ns_arr)
            last_aux = {k: lambda v=v: float(np.asarray(v)[-1])
                        for k, v in auxs.items()}
        else:
            for i in range(K):
                if freeze:
                    ns = ns_consts[ns_max]
                elif fixed_ns is not None:
                    ns = ns_consts[fixed_ns]
                else:
                    ns = ns_consts[quantization_dropout(
                        args.dropout_rate, ns_max, drop_rng)]
                state, aux = step_fn(
                    state, dev_batches[(done + i) % len(dev_batches)],
                    ns, freeze)
            last_aux = {k: lambda v=v: float(np.asarray(v))
                        for k, v in aux.items()}
        done += K
        print(f"  .. {done} steps", file=sys.stderr, flush=True)
        if done % eval_every == 0 or done >= total_steps:
            row = evaluate(state[0], done)
            row["stft_loss"] = round(last_aux["stft_loss"](), 5)
            row["mel_loss"] = round(last_aux["mel_loss"](), 4)
            row["cb_loss"] = round(last_aux["cb_loss"](), 5)
            traj.append(row)
            print(json.dumps(row), flush=True)
            if save_ckpt:
                # rolling params-only save (atomic tmp+rename inside
                # save_checkpoint): a wall-clock kill keeps the last
                # eval-boundary params; ~33 MB, negligible vs eval cost
                from esc_tpu.checkpoint import save_checkpoint
                import os as _os
                save_checkpoint(_os.path.dirname(save_ckpt) or ".",
                                _os.path.basename(save_ckpt), step=done,
                                model_state=jax.device_get(state[0]))
                print(f"params saved to {save_ckpt} at {done}", flush=True)
    return {
        "backend": jax.default_backend(),
        "seed": seed,
        "total_steps": total_steps,
        "pretrain_steps": pretrain_steps,
        "scan": K,
        "mode": mode,
        "fixed_ns": fixed_ns,
        "dropout_rate": dropout_rate,
        "enc_precision": enc_precision,
        "dec_precision": dec_precision,
        "lr": lr,
        "init_ckpt": init_ckpt,
        "config": "ESC-Base (8.39M params, codebook_dims [8]*6)",
        "corpus": corpus_desc,
        "batch_size": batch_size,
        "eval_on": "held-out val corpus" if val_dir else "train batch 0",
        "recipe": "freeze pretrain -> quantization-dropout main, "
                  "constant lr, optimizer renewal at the switch",
        "eval_streams": list(eval_streams),
        "trajectory": traj,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--pretrain-steps", type=int, default=10_000)
    p.add_argument("--scan", type=int, default=1000)
    p.add_argument("--eval-every", type=int, default=10_000)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--out", type=str, default=GOLDEN)
    p.add_argument("--init-ckpt", type=str, default=None)
    p.add_argument("--save-ckpt", type=str, default=None)
    p.add_argument("--mode", choices=("scan", "loop"), default="loop")
    p.add_argument("--fixed-ns", type=int, default=None,
                   help="train every step at this stream count "
                        "(diagnostic; default: quantization dropout)")
    p.add_argument("--dropout-rate", type=float, default=0.75,
                   help="quantization-dropout prob (reference paper "
                        "recipe: 0.75; r1-r3 longruns ran 0.5)")
    p.add_argument("--enc-precision", default=None,
                   help="matmul precision scope for the encoder only "
                        "(default/high/highest) — selective-precision arm")
    p.add_argument("--dec-precision", default=None,
                   help="matmul precision scope for the decoder only")
    p.add_argument("--corpus", choices=("harmonic", "speechlike"),
                   default="harmonic",
                   help="harmonic: the r3 periodic stacks; speechlike: "
                        "glottal-pulse/formant synthesis with transient "
                        "anchors (tools/speech_corpus.py) — required for "
                        "meaningful low-bitrate SI-SDR")
    p.add_argument("--n-clips", type=int, default=None,
                   help="train corpus size (speechlike only; default 32). "
                        "32 x 0.5 s = 16 s of audio is memorized by 60k "
                        "steps — use >=512 for generalization runs")
    p.add_argument("--val-seed", type=int, default=None,
                   help="generate a HELD-OUT val corpus with this seed "
                        "(speechlike only) and evaluate the trajectory on "
                        "it instead of the train batch")
    p.add_argument("--val-clips", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--eval-streams", type=int, nargs="*", default=[6, 3])
    a = p.parse_args(argv)
    with tempfile.TemporaryDirectory() as d, \
            tempfile.TemporaryDirectory() as dv:
        val_dir = None
        if a.corpus == "speechlike":
            from tools.speech_corpus import make_speech_corpus
            n = a.n_clips or 32
            make_speech_corpus(d, n_clips=n)
            corpus_desc = f"{n} speech-like source-filter clips " \
                          "(speech_corpus.py seed 7)"
            if a.val_seed is not None:
                assert a.val_seed != 7, "val seed must differ from train"
                make_speech_corpus(dv, n_clips=a.val_clips, seed=a.val_seed)
                val_dir = dv
                corpus_desc += (f"; held-out val: {a.val_clips} clips "
                                f"seed {a.val_seed}")
        else:
            from tools.quality_trajectory import make_corpus
            make_corpus(d, noise=0.0)
            corpus_desc = "16 noise-free harmonic clips (make_corpus noise=0)"
        result = run_longrun(d, total_steps=a.steps,
                             pretrain_steps=a.pretrain_steps, scan=a.scan,
                             eval_every=a.eval_every, lr=a.lr,
                             init_ckpt=a.init_ckpt, save_ckpt=a.save_ckpt,
                             mode=a.mode, fixed_ns=a.fixed_ns,
                             corpus_desc=corpus_desc,
                             dropout_rate=a.dropout_rate,
                             enc_precision=a.enc_precision,
                             dec_precision=a.dec_precision,
                             val_dir=val_dir, batch_size=a.batch_size,
                             eval_streams=tuple(a.eval_streams))
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"golden long-run trajectory written to {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
