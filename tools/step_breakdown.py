"""Where does the train step's time go? (fetch-verified decomposition)

The production ESC-Base train step is ~490 ms at batch 9 / 3 s clips
fp32-highest (~435 ms at precision=high) with an MFU of ~1.3%
(`artifacts/mfu_estimate.json`) — the chip is idle most of the step, so
the interesting question is *which subgraph* owns the wall time. This
tool times structurally-distinct variants of the step (terms OMITTED
from the graph, not weight-zeroed: the trainer multiplies by Python
floats and XLA does not DCE `x*0.0` for floats, and the aux dict keeps
every term live anyway — trainer.py:162-171), then reports marginal
costs:

  fwd            encoder+VQ+decoder forward (recon path only)
  loss_*         forward + loss value, with {all, no_mel, no_stft, vq_only}
  grad_*         value_and_grad of the same variants
  step_full      grad + AdamW update + clip (the production step)
  mel_alone      mel_spectrogram_loss fwd/grad on fixed audio pairs
  stft_alone     complex_stft_loss fwd/grad on fixed feature pairs

Derived rows: bwd = grad_full - loss_all; mel marginal =
grad_full - grad_no_mel; stft marginal = grad_full - grad_no_stft;
optimizer = step_full - grad_full.

Timing follows the repo's fetch-verified methodology (bench_all.py):
every iteration's output is tapped to a scalar on device, a jitted
reduction combines all taps, and ONE real np.asarray host fetch ends
the block — device execution is in-order, so the fetch cannot complete
before every enqueued iteration has.

Run (TPU): python tools/step_breakdown.py --out artifacts/step_breakdown.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _time_taps(fn, tap, iters=10, blocks=3):
    """Best-of-blocks ms/iteration; every iteration tapped, one fetch."""
    import jax
    import jax.numpy as jnp

    combine = jax.jit(lambda ts: jnp.stack(ts).sum())
    float(np.asarray(tap(fn())))  # compile + steady-state warmup
    best = float("inf")
    for _ in range(blocks):
        taps = []
        t0 = time.perf_counter()
        for _ in range(iters):
            taps.append(tap(fn()))
        float(np.asarray(combine(taps)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=9)
    p.add_argument("--L", type=int, default=47920)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.modules.losses import (complex_stft_loss,
                                        mel_spectrogram_loss)
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer
    from tools.quality_longrun import BASE_CONFIG

    model = ESC(**BASE_CONFIG)
    model.init_params(example_len=a.L)
    module = model.module
    params = model.variables["params"]
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        (0.2 * rng.standard_normal((a.B, a.L))).astype(np.float32))
    ns = jnp.asarray(6, jnp.int32)
    tap0 = jax.jit(lambda r: jnp.asarray(r).ravel()[0])

    rows = {}

    # ---- forward only (recon path)
    @jax.jit
    def fwd(p, b):
        out = module.apply({"params": p}, b, None, ns, False, True)
        return out["recon_audio"]

    rows["fwd_ms"] = _time_taps(lambda: fwd(params, batch), tap0,
                                a.iters)

    # ---- loss variants (terms structurally omitted)
    def make_loss(mel: bool, stft: bool):
        def loss_fn(p, b):
            out = module.apply({"params": p}, b, None, ns, False, True)
            total = out["cm_loss"] * 0.25 + out["cb_loss"] * 1.0
            if mel:
                total = total + mel_spectrogram_loss(
                    out["raw_audio"], out["recon_audio"]) * 0.25
            if stft:
                total = total + complex_stft_loss(
                    out["raw_feat"], out["recon_feat"]) * 1.0
            return total.mean()
        return loss_fn

    variants = {"all": (True, True), "no_mel": (False, True),
                "no_stft": (True, False), "vq_only": (False, False)}
    for name, (mel, stft) in variants.items():
        lf = jax.jit(make_loss(mel, stft))
        rows[f"loss_{name}_ms"] = _time_taps(
            lambda lf=lf: lf(params, batch), tap0, a.iters)
        gf = jax.jit(jax.value_and_grad(make_loss(mel, stft)))
        rows[f"grad_{name}_ms"] = _time_taps(
            lambda gf=gf: gf(params, batch)[0], tap0, a.iters)

    # ---- full production step (grad + clip + AdamW), same harness as
    # perf_ablation._probe_trainstep
    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4,
                                         total_steps=1000, warmup_steps=0),
                           clip_norm=0.5)
    step = tr._make_step_fn(module)
    # step is jitted with donate_argnums=(0,): give it a COPY of the
    # params, or the first call donates (deletes) the buffers that the
    # stft_alone block below still reads — on the axon tunnel that
    # surfaces as INVALID_ARGUMENT at fetch time, not the usual
    # "array has been deleted" (both prior on-chip runs died there).
    params_copy = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = (params_copy, tr.tx.init(params_copy))

    def step_once():
        nonlocal state
        state, aux = step(state, batch, ns, False)
        return aux["loss"]

    rows["step_full_ms"] = _time_taps(step_once, tap0, a.iters)

    # ---- losses alone on fixed tensors (no model in the graph)
    y = jax.device_put(
        (0.2 * rng.standard_normal((a.B, a.L))).astype(np.float32))
    mel_fwd = jax.jit(lambda x, y: mel_spectrogram_loss(x, y).mean())
    mel_grad = jax.jit(jax.value_and_grad(
        lambda y: mel_spectrogram_loss(batch, y).mean()))
    rows["mel_alone_fwd_ms"] = _time_taps(lambda: mel_fwd(batch, y),
                                          tap0, a.iters)
    rows["mel_alone_grad_ms"] = _time_taps(lambda: mel_grad(y)[0],
                                           tap0, a.iters)

    out0 = jax.device_get(fwd(params, batch))  # shapes only
    del out0
    feats = module.apply({"params": params}, batch, None, ns, False, True)
    rf = jax.device_put(np.asarray(jax.device_get(feats["raw_feat"])))
    cf = jax.device_put(np.asarray(jax.device_get(feats["recon_feat"])))
    stft_fwd = jax.jit(lambda x, y: complex_stft_loss(x, y).mean())
    stft_grad = jax.jit(jax.value_and_grad(
        lambda y: complex_stft_loss(rf, y).mean()))
    rows["stft_alone_fwd_ms"] = _time_taps(lambda: stft_fwd(rf, cf),
                                           tap0, a.iters)
    rows["stft_alone_grad_ms"] = _time_taps(lambda: stft_grad(cf)[0],
                                            tap0, a.iters)

    # ---- derived marginals
    rows = {k: round(v, 2) for k, v in rows.items()}
    derived = {
        "bwd_marginal_ms": round(rows["grad_all_ms"] - rows["loss_all_ms"],
                                 2),
        "mel_marginal_grad_ms": round(
            rows["grad_all_ms"] - rows["grad_no_mel_ms"], 2),
        "stft_marginal_grad_ms": round(
            rows["grad_all_ms"] - rows["grad_no_stft_ms"], 2),
        "model_only_grad_ms": rows["grad_vq_only_ms"],
        "optimizer_marginal_ms": round(
            rows["step_full_ms"] - rows["grad_all_ms"], 2),
    }
    result = {
        "backend": jax.default_backend(),
        "B": a.B, "L": a.L,
        "matmul_precision": os.environ.get(
            "JAX_DEFAULT_MATMUL_PRECISION", "highest (esc_tpu default)"),
        "rows_ms": rows,
        "derived_ms": derived,
    }
    print(json.dumps(result, indent=1))
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
