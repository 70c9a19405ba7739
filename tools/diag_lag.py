"""Alignment diagnostic for the flat-SI-SDR signature (VERDICT r2 item
1): if recon_audio is a TIME-SHIFTED copy of the target, MelDistance
improves with training while SI-SDR stays pinned at chance — the
training loss is computed in the STFT feature domain and would never
see the shift. Cross-correlate recon vs target at a trained checkpoint
and report SI-SDR as a function of integer lag.

Run: python tools/diag_lag.py --ckpt /tmp/esc_longrun/stageA.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def sisdr_np(ref: np.ndarray, est: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    a = (est * ref).sum() / ((ref * ref).sum() + 1e-12)
    t = a * ref
    e = est - t
    return float(10 * np.log10(((t * t).sum() + 1e-12)
                               / ((e * e).sum() + 1e-12)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/esc_longrun/stageA.ckpt")
    p.add_argument("--max-lag", type=int, default=400)
    p.add_argument("--streams", type=int, nargs="+", default=[6, 3])
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from esc_tpu.checkpoint import restore_into
    from esc_tpu.models import make_model
    from tools.quality_longrun import BASE_CONFIG
    from tools.quality_trajectory import make_corpus
    from esc_tpu.train.data import EvalSet

    model = make_model(BASE_CONFIG, "csvq+swinT")
    with tempfile.TemporaryDirectory() as d:
        make_corpus(d, noise=0.0)
        ds = EvalSet(d)
        batch = np.stack([ds[i] for i in range(8)])
    model.init_params(example_len=batch.shape[1])
    payload = restore_into(a.ckpt, model_state_target=jax.device_get(
        model.variables["params"]))
    model.variables = {"params": jax.tree_util.tree_map(
        jnp.asarray, payload["model_state_dict"])}

    for s in a.streams:
        out = model(batch, None, num_streams=s)
        recon = np.asarray(out["recon_audio"], np.float32)
        raw = np.asarray(out["raw_audio"], np.float32)
        print(f"\n== num_streams={s}  recon {recon.shape} vs batch "
              f"{batch.shape} raw {raw.shape}")
        for b in range(min(4, len(batch))):
            x = batch[b][: recon.shape[1]]
            y = recon[b][: len(x)]
            # integer-lag scan via FFT cross-correlation
            n = len(x)
            X = np.fft.rfft(x, 2 * n)
            Y = np.fft.rfft(y, 2 * n)
            xc = np.fft.irfft(X.conj() * Y)  # xc[k] ~ corr(y shifted by k)
            lags = np.r_[0: a.max_lag, -a.max_lag: 0]
            k = lags[np.argmax(np.abs(xc[lags]))]
            base = sisdr_np(x, y)
            if k > 0:
                best = sisdr_np(x[k:], y[: len(x) - k])
            elif k < 0:
                best = sisdr_np(x[: len(x) + k], y[-k:])
            else:
                best = base
            # also check raw_audio framing vs the input batch
            raw_eq = np.abs(raw[b][: n] - x[: raw.shape[1]]).max()
            print(f"  clip{b}: SISDR(lag0) {base:7.2f} dB | best lag {k:4d} "
                  f"-> {best:7.2f} dB | polarity "
                  f"{'+' if xc[lags][np.argmax(np.abs(xc[lags]))] >= 0 else '-'}"
                  f" | max|raw-batch| {raw_eq:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
