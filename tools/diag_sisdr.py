"""Diagnose the flat-SI-SDR finding (VERDICT r2 item 1).

Three experiments that together distinguish "phase not yet learned"
from "a bug in the phase path":

A. Transform sanity: SI-SDR(istft(stft(x)), x) must be ~> 40 dB.
B. Loss->SI-SDR calibration: perturb the true complex STFT with noise
   at several scales; print (complex_stft_loss, SI-SDR of istft).
   This maps the training loss value onto the waveform-fidelity scale,
   so we can read off what loss level *should* deliver positive SI-SDR.
C. Autoencoder overfit (freeze=True, VQ bypassed): if the backbone can
   drive the complex loss below the level B says gives positive SI-SDR
   but SI-SDR stays at chance (~-40 dB), the bug is in the recon path;
   if loss plateaus above it, it's a capacity/optimization matter.

Run: python tools/diag_sisdr.py --steps 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--freeze", action="store_true", default=True)
    p.add_argument("--no-freeze", dest="freeze", action="store_false")
    p.add_argument("--mel-weight", type=float, default=0.25)
    p.add_argument("--width", type=float, default=1.0,
                   help="h_dims multiplier over TINY_CONFIG")
    p.add_argument("--skip-ab", action="store_true")
    p.add_argument("--noise", type=float, default=0.02)
    p.add_argument("--scan", type=int, default=1,
                   help="steps per device dispatch (lax.scan multi-step)")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from esc_tpu.metrics import SISDR, MelSpectrogramDistance
    from esc_tpu.modules.losses import complex_stft_loss
    from esc_tpu.ops.stft import audio_reconstruct, spec_transform
    from esc_tpu.train.trainer import Trainer
    from esc_tpu.utils import dict2namespace
    from tests.test_model_shapes import TINY_CONFIG  # noqa: F401
    from tools.quality_trajectory import make_corpus

    sdr_fn, mel_fn = SISDR(), MelSpectrogramDistance()

    model_cfg = dict(TINY_CONFIG)
    if a.width != 1.0:
        model_cfg["h_dims"] = [max(4, int(h * a.width)) // 2 * 2
                               for h in model_cfg["h_dims"]]
    with tempfile.TemporaryDirectory() as d:
        make_corpus(d, noise=a.noise)
        config = dict2namespace({
            "data": {"train_data_path": d, "val_data_path": d,
                     "num_workers": 0, "train_bs_per_device": 8,
                     "val_bs_per_device": 8},
            "model_name": "csvq+swinT",
            "model": model_cfg,
            "loss": {"stft_weight": 1.0, "cm_weight": 0.25,
                     "cb_weight": 1.0, "mel_weight": a.mel_weight},
        })
        args = argparse.Namespace(
            exp_name="diag", lr=a.lr, num_epochs=1,
            num_pretraining_epochs=0, num_warmup_steps=0,
            val_metric="SISDR", scheduler_type="constant",
            dropout_rate=0.5, pretrain_ckp=None, log_steps=10 ** 9,
            save_path=None, seed=11)
        trainer = Trainer(config, args, devices=jax.devices()[:1])
        model, train_dl, _ = trainer.load()
        batches = list(train_dl)
        x = batches[0]  # (8, L) fixed eval batch

        # ---------------- A: transform roundtrip ----------------
        feat = spec_transform(jnp.asarray(x))
        if not a.skip_ab:
            rt = np.asarray(audio_reconstruct(feat))
            print("A. roundtrip SI-SDR:",
                  np.round(np.asarray(sdr_fn(x, rt)), 2).tolist())

        # ---------------- B: loss -> SI-SDR calibration ----------------
        rng = np.random.default_rng(0)
        featn = np.asarray(feat)
        print("B. calibration (noise on complex STFT):")
        for sigma_rel in ([] if a.skip_ab else
                          [1.0, 0.5, 0.2, 0.1, 0.05, 0.02, 0.01]):
            sigma = sigma_rel * featn.std()
            noisy = featn + sigma * rng.standard_normal(featn.shape
                                                        ).astype(np.float32)
            l = float(np.mean(np.asarray(
                complex_stft_loss(jnp.asarray(featn), jnp.asarray(noisy)))))
            s = float(np.mean(np.asarray(
                sdr_fn(x, audio_reconstruct(jnp.asarray(noisy))))))
            print(f"   sigma={sigma_rel:5.2f}*std  stft_loss={l:8.5f}"
                  f"  SI-SDR={s:7.2f} dB")

        # ---------------- C: autoencoder overfit ----------------
        params = model.variables["params"]
        state = (params, trainer.tx.init(params))
        step_fn = trainer._make_step_fn(model.module)
        ns = model_cfg["max_streams"]

        def report(step, aux_stft, aux_mel):
            model.variables = {"params": state[0]}
            out = model(x, None, num_streams=ns)
            recon = np.asarray(out["recon_audio"])
            row = {
                "step": step,
                "stft_loss": round(float(aux_stft), 5),
                "mel_loss": round(float(aux_mel), 4),
                "SISDR": round(float(np.mean(sdr_fn(x, recon))), 2),
                "MelDist": round(float(np.mean(mel_fn(x, recon))), 3),
            }
            # best-lag cross-correlation: detects a shift bug
            xr = np.asarray(x[0]) - np.asarray(x[0]).mean()
            yr = recon[0] - recon[0].mean()
            cc = np.correlate(yr, xr, mode="full")
            row["best_lag"] = int(np.argmax(np.abs(cc)) - (len(xr) - 1))
            print("  ", json.dumps(row), flush=True)

        print(f"C. overfit (freeze={a.freeze}, steps={a.steps}, "
              f"scan={a.scan}):", flush=True)
        if a.scan > 1:
            from esc_tpu.train.trainer import make_multi_step
            multi = make_multi_step(step_fn.core, freeze=a.freeze)
            K = a.scan
            stacked = jax.device_put(np.stack(
                [batches[i % len(batches)] for i in range(K)]))  # (K, B, L)
            ns_arr = jnp.full((K,), ns, jnp.int32)
            done = 0
            while done < a.steps:
                state, auxs = multi(state, stacked, ns_arr)
                done += K
                report(done, np.asarray(auxs["stft_loss"])[-1],
                       np.asarray(auxs["mel_loss"])[-1])
        else:
            for step in range(a.steps):
                batch = batches[step % len(batches)]
                state, aux = step_fn(state, batch,
                                     num_streams=jnp.int32(ns),
                                     freeze=a.freeze)
                if (step + 1) % a.log_every == 0 or step == 0:
                    report(step + 1, aux["stft_loss"], aux["mel_loss"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
