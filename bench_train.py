"""Benchmark: ESC-Base training throughput on one chip (measured, not a
DESIGN.md claim).

Uses the exact jitted train step the Trainer runs (same losses, AdamW +
clip, traced num_streams) on synthetic 3 s batches, batch 9 per chip —
the reference's per-GPU batch (global 36 over 4x RTX 4090 at 4.34
steps/s => 156.3 samples/s, BASELINE.md "Training cost", README.md:48).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is per-chip samples/s over the reference's per-GPU 39.1.
"""

import json
import sys
import time
from types import SimpleNamespace


def main():
    import jax
    import numpy as np

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer

    config = dict(
        backbone="transformer", in_dim=2, in_freq=192,
        h_dims=[45, 72, 96, 144, 192, 384], max_streams=6,
        win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
        swin_heads=[3, 6, 12, 24, 24], swin_depth=2, window_size=4,
        mlp_ratio=4.0, overlap=2, group_size=3, codebook_size=1024,
        codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
    )
    B, L = 9, 47920  # reference per-GPU batch, 3 s EvalSet clips

    model = ESC(**config)
    model.init_params(example_len=L)

    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4, total_steps=1000,
                                         warmup_steps=0), clip_norm=0.5)
    train_step = tr._make_step_fn(model.module)

    params = model.variables["params"]
    state = (params, tr.tx.init(params))
    rng = np.random.default_rng(53)
    batch = (0.2 * rng.standard_normal((B, L))).astype(np.float32)
    ns = jax.numpy.asarray(6, jax.numpy.int32)

    batch = jax.device_put(batch)
    state, aux = train_step(state, batch, ns, False)  # compile
    float(np.asarray(aux["loss"]))

    # Fetch-verified timing: steps chain through `state`, and each block
    # ends with a REAL host fetch of the loss (np.asarray) — on this
    # environment's remote-TPU tunnel, block_until_ready can return
    # before device work finishes, so naive timings are invalid.
    iters, blocks = 20, 3
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = train_step(state, batch, ns, False)
        float(np.asarray(aux["loss"]))
        best = min(best, time.perf_counter() - t0)
    dispatch_ms = best / iters * 1e3

    # Sustained scan-mode throughput — the Trainer's production path
    # (make_multi_step): K steps fused in one lax.scan dispatch. On this
    # environment sustained == per-dispatch to ~1% (dispatch latency is
    # negligible); both are printed so the claim stays checkable.
    from esc_tpu.train.trainer import make_multi_step

    K = 50
    multi = make_multi_step(train_step.core, False)
    batches = jax.device_put(np.broadcast_to(
        np.asarray(batch), (K,) + np.asarray(batch).shape).copy())
    ns_arr = jax.numpy.full((K,), 6, jax.numpy.int32)
    state, auxs = multi(state, batches, ns_arr)
    float(np.asarray(auxs["loss"])[-1])  # warm + fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, auxs = multi(state, batches, ns_arr)
        float(np.asarray(auxs["loss"])[-1])  # real D2H fetch
        best = min(best, time.perf_counter() - t0)
    step_ms = best / K * 1e3
    samples_per_s = B / (best / K)

    # MFU: XLA cost analysis of this exact compiled step at (9, 47920)
    # is 1.2704e12 FLOPs (tools/mfu.py, artifacts/mfu_estimate.json —
    # batch fwd+bwd+AdamW). v5e datasheet peaks.
    flops_per_step = 1.2704e12 if (B, L) == (9, 47920) else None
    mfu = (round(flops_per_step / (step_ms / 1e3) / 98.3e12, 4)
           if flops_per_step else None)

    ref_per_gpu = 4.34 * 36 / 4  # 39.06 samples/s per RTX 4090
    print(json.dumps({
        "metric": "train_samples_per_s_per_chip",
        "value": round(samples_per_s, 1),
        "unit": f"samples/s (ESC-Base, batch {B}, 3s clips; sustained "
                f"scan-mode step {step_ms:.2f} ms, per-dispatch "
                f"{dispatch_ms:.2f} ms; MFU vs fp32 peak {mfu})",
        "vs_baseline": round(samples_per_s / ref_per_gpu, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
