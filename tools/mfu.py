"""MFU estimate for the ESC-Base train step (VERDICT r3 item 2).

MFU = model FLOPs per step / step wall time / chip peak. FLOPs come
from XLA's own cost analysis of the compiled train-step graph (exact
for the compiled program, so rematerialization and the fused backward
are included — this is "hardware FLOPs" of the program, the honest
numerator for a step-time denominator). The FLOP count is
backend-independent (it is a property of the program), so it can be
computed on CPU while the step time comes from the fetch-verified
on-chip measurement (tools/perf_ablation.py).

Peak reference: TPU v5e ~197 TFLOP/s bf16, ~98.3 TFLOP/s fp32-ish
(HIGHEST fp32 matmuls lower to multi-pass bf16, so the achievable
matmul peak in highest mode is lower still — the bf16-peak MFU is the
conservative denominator and is what we report).

Run: python tools/mfu.py [--batch 9] [--step-ms 493] [--on-chip]
  --on-chip additionally measures step time here (fetch-verified
  chained timing) instead of using --step-ms.
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

V5E_PEAK_BF16 = 197e12
V5E_PEAK_FP32 = 98.3e12  # upper bound; HIGHEST multi-pass is lower


def build_step(B: int, L: int):
    import jax.numpy as jnp
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer
    from tools.quality_longrun import BASE_CONFIG

    model = ESC(**BASE_CONFIG)
    model.init_params(example_len=L)
    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4,
                                         total_steps=1000, warmup_steps=0),
                           clip_norm=0.5)
    step = tr._make_step_fn(model.module)
    params = model.variables["params"]
    state = (params, tr.tx.init(params))
    rng = np.random.default_rng(0)
    batch = (0.2 * rng.standard_normal((B, L))).astype(np.float32)
    return step, state, batch


def component_breakdown(B: int, L: int) -> dict:
    """XLA-cost-analysis FLOPs of the step's pieces (all jitted
    standalone): encoder fwd, full fwd, train fwd (w/ losses), and the
    loss transforms alone. Backward ~2x forward; Adam is negligible."""
    import jax
    import jax.numpy as jnp

    from esc_tpu.models import ESC
    from esc_tpu.modules.losses import (complex_stft_loss,
                                        mel_spectrogram_loss)
    from tools.quality_longrun import BASE_CONFIG

    model = ESC(**BASE_CONFIG)
    model.init_params(example_len=L)
    module = model.module
    V = model.variables
    rng = np.random.default_rng(0)
    x = jnp.asarray((0.2 * rng.standard_normal((B, L))).astype(np.float32))
    ns = jnp.asarray(6, jnp.int32)

    def flops_of(fn, *args):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c.get("flops", float("nan")))

    fwd = lambda v, xx: module.apply(v, xx, None, ns, False, True)  # noqa
    out = fwd(V, x)
    raw_feat, recon_feat = out["raw_feat"], out["recon_feat"]
    raw_a, recon_a = out["raw_audio"], out["recon_audio"]

    rows = {
        "encode_path": flops_of(lambda v, xx: module.apply(
            v, xx, 6, method="encode"), V, x),
        "full_train_fwd": flops_of(
            lambda v, xx: fwd(v, xx)["recon_audio"], V, x),
        "mel_loss_alone": flops_of(
            lambda a, b: mel_spectrogram_loss(a, b), raw_a, recon_a),
        "stft_loss_alone": flops_of(
            lambda a, b: complex_stft_loss(a, b), raw_feat, recon_feat),
    }
    return {k: round(v / 1e9, 2) for k, v in rows.items()}  # GFLOPs


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=9)
    p.add_argument("--breakdown", action="store_true")
    p.add_argument("--clip-len", type=int, default=47920)
    p.add_argument("--step-ms", type=float, default=493.0,
                   help="fetch-verified on-chip step time to divide by "
                        "(r3 measurement: 493 ms at batch 9, "
                        "fp32-highest)")
    p.add_argument("--on-chip", action="store_true",
                   help="measure step time in this process instead")
    p.add_argument("--timing-source", default=None,
                   help="provenance label for --step-ms (e.g. the "
                        "artifact the number was measured into)")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    step, state, batch_np = build_step(a.batch, a.clip_len)
    batch = jax.device_put(batch_np)
    ns = jnp.asarray(6, jnp.int32)

    # step is a cached-jit wrapper; reach its core for lowering
    core = getattr(step, "core", step)
    lowered = jax.jit(core, static_argnums=(3,)).lower(state, batch, ns,
                                                       False)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan")))

    step_ms = a.step_ms
    if a.on_chip:
        state2, aux = step(state, batch, ns, False)
        float(np.asarray(aux["loss"]))
        iters, best = 10, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state2, aux = step(state2, batch, ns, False)
            float(np.asarray(aux["loss"]))  # real D2H fetch, not b_u_r
            best = min(best, time.perf_counter() - t0)
        step_ms = best / iters * 1e3

    sec = step_ms / 1e3
    out = {
        "model": "ESC-Base 8.39M",
        "batch": a.batch,
        "clip_len": a.clip_len,
        "program_flops_per_step": flops,
        "tflops_per_step": round(flops / 1e12, 3),
        "step_ms": round(step_ms, 1),
        "achieved_tflops_s": round(flops / sec / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / sec / V5E_PEAK_BF16, 4),
        "mfu_vs_fp32_peak": round(flops / sec / V5E_PEAK_FP32, 4),
        "backend": jax.default_backend(),
        "timing_source": "measured-here" if a.on_chip
                         else (a.timing_source or
                               "r3 fetch-verified 493ms"),
        "note": "flops from XLA cost analysis of the compiled step "
                "(batch fwd+bwd+adam); peaks are v5e datasheet",
    }
    if a.breakdown:
        out["component_gflops"] = component_breakdown(a.batch, a.clip_len)
    print(json.dumps(out))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
