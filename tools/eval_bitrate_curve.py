"""Evaluate a trained checkpoint across the full bitrate ladder.

Loads ESC-Base params from a longrun checkpoint and reports SI-SDR /
MelDistance at every stream count 1..6 (1.5..9 kbps) on the
deterministic harmonic corpus the longrun golden was trained on
(tools/quality_trajectory.make_corpus, noise=0).

Purpose: the reference quality figure (BASELINE.md, reference
README.md:70-73 results.png) degrades SMOOTHLY with bitrate — SI-SDR
+2.0 dB even at 1.5 kbps. If this curve instead shows a cliff (positive
only at ns=6, chance level below), that implicates the reduced-stream
decode/training path rather than training scale.

Also reports SISDR_aligned: SI-SDR after removing the single best
global time shift (full-range FFT cross-correlation per clip). The
golden corpus is PERIODIC (harmonic stacks); at reduced streams the
decoder can reconstruct the right waveform up to a time/phase drift,
which costs raw SI-SDR everything on a periodic signal while being
inaudible. aligned >> raw at low streams ==> the low-bitrate SI-SDR
floor is a corpus artifact (no transient anchors), not a decode bug.
A STOI column (in-repo, phase-robust intelligibility) covers the case
where phases scramble per-harmonic rather than by one global shift:
high STOI + chance SI-SDR at low streams = magnitudes right, absolute
phase unanchored.

Run: python tools/eval_bitrate_curve.py --ckpt /tmp/esc_longrun/stageC.ckpt
     (works on CPU or TPU; one compile per stream count)
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


def _sisdr_np(ref: np.ndarray, est: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    a = float(np.dot(est, ref) / (np.dot(ref, ref) + 1e-12))
    proj = a * ref
    noise = est - proj
    return float(10.0 * np.log10(
        (np.dot(proj, proj) + 1e-12) / (np.dot(noise, noise) + 1e-12)))


def aligned_sisdr(ref: np.ndarray, est: np.ndarray) -> tuple[float, int]:
    """Best single-global-shift SI-SDR via FFT cross-correlation.

    Returns (sisdr_db_at_best_lag, best_lag). Positive lag means the
    estimate is delayed relative to the reference.
    """
    n = len(ref)
    nfft = 1 << int(np.ceil(np.log2(2 * n - 1)))
    r = np.fft.rfft(ref - ref.mean(), nfft)
    e = np.fft.rfft(est - est.mean(), nfft)
    xc = np.fft.irfft(e * np.conj(r), nfft)
    lags = np.concatenate([np.arange(0, n), np.arange(-n + 1, 0)])
    order = np.argsort(np.abs(np.concatenate([xc[:n], xc[nfft - n + 1:]])))
    best = lags[order[-1]]
    if best > 0:
        s = _sisdr_np(ref[: n - best], est[best:])
    elif best < 0:
        s = _sisdr_np(ref[-best:], est[: n + best])
    else:
        s = _sisdr_np(ref, est)
    return s, int(best)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default=None, help="optional JSON output path")
    p.add_argument("--streams", type=int, nargs="*",
                   default=[1, 2, 3, 4, 5, 6])
    p.add_argument("--corpus", choices=("harmonic", "speechlike"),
                   default="harmonic",
                   help="eval corpus; use the one the checkpoint was "
                        "trained on for apples-to-apples curves")
    p.add_argument("--val-seed", type=int, default=None,
                   help="corpus RNG seed for a HELD-OUT eval (speechlike "
                        "only; train seed is 7 — any other value yields "
                        "clips the checkpoint never saw). Default: the "
                        "train seed (legacy trainset eval, labeled so).")
    p.add_argument("--n-clips", type=int, default=None,
                   help="number of eval clips (default: corpus default)")
    p.add_argument("--n-batches", type=int, default=1,
                   help="how many batches of 8 to evaluate (default 1)")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from esc_tpu.checkpoint import restore_into
    from esc_tpu.metrics import MelSpectrogramDistance, SISDR
    from esc_tpu.metrics_stoi import STOI
    from esc_tpu.train.trainer import Trainer
    from esc_tpu.utils import dict2namespace
    from tools.quality_longrun import BASE_CONFIG

    corpus_seed = 7 if a.val_seed is None else a.val_seed
    held_out = a.corpus == "speechlike" and corpus_seed != 7
    with tempfile.TemporaryDirectory() as d:
        if a.corpus == "speechlike":
            from tools.speech_corpus import make_speech_corpus, N_CLIPS
            make_speech_corpus(d, n_clips=a.n_clips or N_CLIPS,
                               seed=corpus_seed)
        else:
            from tools.quality_trajectory import make_corpus
            make_corpus(d, noise=0.0)
        config = dict2namespace({
            "data": {"train_data_path": d, "val_data_path": d,
                     "num_workers": 0, "train_bs_per_device": 8,
                     "val_bs_per_device": 8},
            "model_name": "csvq+swinT",
            "model": BASE_CONFIG,
            "loss": {"stft_weight": 1.0, "cm_weight": 0.25,
                     "cb_weight": 1.0, "mel_weight": 0.25},
        })
        args = argparse.Namespace(
            exp_name="bitrate_curve", lr=1e-4, num_epochs=1,
            num_pretraining_epochs=0, num_warmup_steps=0,
            val_metric="SISDR", scheduler_type="constant",
            dropout_rate=0.5, pretrain_ckp=None, log_steps=10 ** 9,
            save_path=None, seed=11)
        trainer = Trainer(config, args, devices=jax.devices()[:1])
        model, train_dl, _ = trainer.load()
        batches = list(train_dl)

    payload = restore_into(
        a.ckpt, model_state_target=jax.device_get(model.variables["params"]))
    model.variables = {"params": jax.tree_util.tree_map(
        jnp.asarray, payload["model_state_dict"])}
    print(f"loaded params from {a.ckpt}", flush=True)

    from esc_tpu.metrics import PESQ, EntropyCounter
    mel_fn, sdr_fn, stoi_fn, pesq_fn = (MelSpectrogramDistance(), SISDR(),
                                        STOI(), PESQ())
    eval_batches = batches[:a.n_batches]
    rows = []
    for s in a.streams:
        accum = {"SISDR": [], "SISDR_aligned": [], "STOI": [], "PESQ": [],
                 "MelDist": []}
        lags = []
        # per-stream codebook utilization at this transmitted stream count
        # (reference semantics: scripts/test.py:35-48, metrics.py:68-77)
        ec = EntropyCounter(model.module.codebook_size, num_streams=s,
                            num_groups=model.module.group_size)
        zq_sq = np.zeros(s)   # sum of squared quantized residuals per stream
        zq_n = np.zeros(s)
        for x in eval_batches:
            out = model(x, None, num_streams=s)
            recon = np.asarray(out["recon_audio"])
            xh = np.asarray(x)
            codes = out["codes"][:, :s]
            ec.update(codes)
            # quantized residual magnitude per scale: decodes each
            # stream's codes through its own product VQ — a dead stream
            # shows up as zq_rms ~ 0 (or utilization ~ 0 bits).
            for i in range(s):
                zq = np.asarray(model.module.apply(
                    model.variables, np.asarray(codes[:, i]), 3,
                    method=lambda m, c, d, _i=i: m.quantizers[_i].decode(
                        c, d)))
                zq_sq[i] += float((zq.astype(np.float64) ** 2).sum())
                zq_n[i] += zq.size
            al = [aligned_sisdr(xh[b], recon[b]) for b in range(xh.shape[0])]
            lags += [lag for _, lag in al]
            accum["SISDR"] += list(np.asarray(sdr_fn(x, recon)))
            accum["SISDR_aligned"] += [v for v, _ in al]
            accum["STOI"] += list(np.asarray(stoi_fn(xh, recon)))
            accum["PESQ"] += list(np.asarray(pesq_fn(xh, recon)))
            accum["MelDist"] += list(np.asarray(mel_fn(x, recon)))
        util, per_book = ec.compute_utilization()
        per_stream_util = [
            round(float(np.mean([per_book[f"stream_{i}_group_{g + 1}"]
                                 for g in range(model.module.group_size)])),
                  4)
            for i in range(s)]
        row = {
            "num_streams": s,
            "kbps": 1.5 * s,
            "SISDR": round(float(np.mean(accum["SISDR"])), 3),
            "SISDR_aligned": round(float(np.mean(accum["SISDR_aligned"])),
                                   3),
            "lags": lags,
            "STOI": round(float(np.nanmean(accum["STOI"])), 3),
            "PESQ": round(float(np.nanmean(accum["PESQ"])), 3),
            "MelDist": round(float(np.mean(accum["MelDist"])), 3),
            "utilization": round(float(util), 4),
            "utilization_per_stream": per_stream_util,
            "zq_rms_per_stream": [
                round(float(np.sqrt(zq_sq[i] / max(zq_n[i], 1))), 5)
                for i in range(s)],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if a.out:
        from esc_tpu.metrics import PESQ_BACKEND
        with open(a.out, "w") as f:
            json.dump({"ckpt": a.ckpt, "backend": jax.default_backend(),
                       "corpus": a.corpus, "corpus_seed": corpus_seed,
                       "held_out": held_out, "n_clips": a.n_clips,
                       "pesq_backend": PESQ_BACKEND,
                       "curve": rows}, f, indent=2)
        print(f"curve written to {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
