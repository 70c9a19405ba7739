"""Quality-trajectory regression harness (VERDICT round-1 item 8).

In an environment with no released checkpoint and no eval corpus, the
feasible stand-in for BASELINE.md quality parity is evidence that the
training loop *drives reconstruction quality*: a deterministic
few-hundred-step run on synthetic data whose MelDistance / SI-SDR
trajectory is committed (tests/golden/quality_trajectory.json) and
re-asserted by tests/test_quality_trajectory.py within loose bounds.

Run `python tools/quality_trajectory.py` to regenerate the golden file
(any backend; the committed one was produced on a TPU v5e chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # allow `python tools/quality_trajectory.py`
    sys.path.insert(0, _REPO)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "quality_trajectory.json")

N_CLIPS = 16
CLIP_LEN = 8000  # 7920 after EvalSet trim -> T=100 frames (even)
SR = 16000


def make_corpus(folder: str, seed: int = 3, noise: float = 0.02) -> None:
    """Deterministic speech-like corpus: harmonic stacks with slow AM
    envelopes (+ optional noise floor).

    ``noise=0`` matters for waveform-fidelity (SI-SDR) studies: an
    i.i.d. noise floor of amplitude a becomes a^0.3-sized targets with
    random signs after the power-law compression of the complex STFT
    loss — unpredictable bins then dominate the loss floor (zero-pred
    level 0.40 on this corpus vs random-phase 0.81) and the few
    harmonic bins that carry the waveform correlation get almost no
    gradient. Real speech has no i.i.d. component, so the reference's
    training corpus does not exhibit the pathology."""
    from esc_tpu.train.data import save_wav
    rng = np.random.default_rng(seed)
    t = np.arange(CLIP_LEN) / SR
    os.makedirs(folder, exist_ok=True)
    for i in range(N_CLIPS):
        f0 = 90.0 + 17.0 * i
        x = np.zeros_like(t)
        for h in range(1, 5):
            x += (0.4 / h) * np.sin(2 * np.pi * f0 * h * t
                                    + rng.uniform(0, 2 * np.pi))
        env = 0.6 + 0.4 * np.sin(2 * np.pi * (1.5 + 0.5 * i) * t)
        x = x * env
        if noise:
            x = x + noise * rng.standard_normal(t.shape)
        save_wav(os.path.join(folder, f"clip_{i:02d}.wav"),
                 x.astype(np.float32))


def run_trajectory(data_dir: str, total_steps: int = 400,
                   pretrain_steps: int = 40,
                   eval_every: int = 50, seed: int = 11) -> Dict:
    """Train the tiny codec with the real Trainer step and record
    MelDistance / SI-SDR on a fixed batch at checkpoints."""
    import jax

    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.train.data import quantization_dropout
    from esc_tpu.train.trainer import Trainer
    from esc_tpu.utils import dict2namespace
    from tests.test_model_shapes import TINY_CONFIG

    config = dict2namespace({
        "data": {"train_data_path": data_dir, "val_data_path": data_dir,
                 "num_workers": 0, "train_bs_per_device": 8,
                 "val_bs_per_device": 8},
        "model_name": "csvq+swinT",
        "model": TINY_CONFIG,
        "loss": {"stft_weight": 1.0, "cm_weight": 0.25, "cb_weight": 1.0,
                 "mel_weight": 0.25},
    })
    args = argparse.Namespace(
        exp_name="traj", lr=4e-4, num_epochs=1, num_pretraining_epochs=0,
        num_warmup_steps=0, val_metric="SISDR", scheduler_type="constant",
        dropout_rate=0.5, pretrain_ckp=None, log_steps=10 ** 9,
        save_path=None, seed=seed)

    trainer = Trainer(config, args, devices=jax.devices()[:1])
    model, train_dl, _ = trainer.load()
    params = model.variables["params"]
    state = (params, trainer.tx.init(params))
    step_fn = trainer._make_step_fn(model.module)

    batches = list(train_dl)  # 2 fixed batches of 8
    eval_batch = batches[0]
    mel_fn, sdr_fn = MelSpectrogramDistance(), SISDR()
    drop_rng = np.random.default_rng(seed)

    def evaluate(p) -> Dict[str, float]:
        model.variables = {"params": p}
        out = model(eval_batch, None, num_streams=TINY_CONFIG["max_streams"])
        recon = np.asarray(out["recon_audio"])
        return {"MelDistance": round(float(np.mean(mel_fn(eval_batch, recon))), 4),
                "SISDR": round(float(np.mean(sdr_fn(eval_batch, recon))), 4)}

    traj: List[Dict] = [dict(step=0, **evaluate(state[0]))]
    for step in range(total_steps):
        batch = batches[step % len(batches)]
        freeze = step < pretrain_steps
        s = (TINY_CONFIG["max_streams"] if freeze else quantization_dropout(
            args.dropout_rate, TINY_CONFIG["max_streams"], drop_rng))
        state, aux = step_fn(state, batch, num_streams=s, freeze=freeze)
        if step + 1 == pretrain_steps:
            # optimizer renewal at the pretrain/main boundary, as the
            # real trainer does (trainer.py "Optimizer Renewed")
            state = (state[0], trainer.tx.init(state[0]))
        if (step + 1) % eval_every == 0 or step + 1 == total_steps:
            traj.append(dict(step=step + 1, **evaluate(state[0])))
    return {
        "backend": jax.default_backend(),
        "seed": seed,
        "total_steps": total_steps,
        "pretrain_steps": pretrain_steps,
        "config": "TINY_CONFIG (tests/test_model_shapes.py)",
        "corpus": f"{N_CLIPS} synthetic harmonic clips, seed 3",
        "trajectory": traj,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--out", type=str, default=GOLDEN)
    a = p.parse_args(argv)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        make_corpus(d)
        result = run_trajectory(d, total_steps=a.steps)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["trajectory"][-1]))
    print(f"golden trajectory written to {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
