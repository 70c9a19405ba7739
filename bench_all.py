"""Breadth benchmark: every model family on one chip.

Measures, on real hardware (the same jitted entry points the CLIs use):
  - ESC-Base  encode+decode RTF (batch 16, 3 s clips, 9 kbps)
  - ESC-Base  batch-1 latency + RTF-vs-batch curve
  - ESC-Base  bf16 RTF
  - ESC-Large encode+decode RTF (swin_depth 4, README.md:65)
  - ESC-Base  training samples/s (exact Trainer step, batch 9)
  - DAC-Tiny  encode+decode RTF (configs/dac/16khz_dns_9k_tiny.yml)
  - EnCodec   encode+decode RTF (24 kHz, 6 kbps)

Timing methodology (fetch-verified): on this environment's remote-TPU
tunnel ``jax.block_until_ready`` can return before device work actually
finishes, which invalidates naive loop timings (observed up to ~90x
inflation). Throughput timings here dispatch the loop, then fetch ONE
combined scalar reduction over EVERY iteration's output to the host
(np.asarray) — a true data round-trip that cannot complete early.
Latency timings chain iteration i+1's input on iteration i's output so
work cannot overlap.

Prints one JSON line per entry and writes them all to BENCH_EXTRA.json.
The driver-graded single-line artifact stays `bench.py`; this file is the
README performance table's source of truth.
"""

import json
import os
import sys
import time

import numpy as np


def _best_time(fn, iters=10, blocks=3):
    """Fetch-verified pipelined throughput: sec per iteration."""
    import jax
    import jax.numpy as jnp

    tap = jax.jit(lambda r: jnp.asarray(r).ravel()[0])
    combine = jax.jit(lambda ts: jnp.stack(ts).sum())
    float(np.asarray(tap(fn())))  # steady-state warmup + compile
    best = float("inf")
    for _ in range(blocks):
        taps = []
        t0 = time.perf_counter()
        for _ in range(iters):
            taps.append(tap(fn()))
        float(np.asarray(combine(taps)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def check_kernels_onchip():
    """Mosaic-lowered parity for the Pallas kernels on the real backend
    (interpret-mode CI can't catch TPU lowering regressions — ADVICE r2):
    fused window attention (fp32 exact vs jnp; bf16 within rounding) at
    every ESC-Base head geometry, incl. the sliced-store head-group path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esc_tpu.ops.pallas.attention_kernels import fused_window_attention

    rng = np.random.default_rng(3)
    for G, C, nh in [(64, 96, 12), (64, 384, 24), (64, 192, 24)]:
        N, hd = 16, C // nh
        scale = hd ** -0.5
        q, k, v = (jnp.asarray(rng.standard_normal((G, N, C))
                               .astype(np.float32)) for _ in range(3))
        bias = jnp.asarray(rng.standard_normal((nh, N, N)).astype(np.float32))
        qh = q.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("ghnd,ghmd->ghnm", qh * scale, kh,
                       precision=jax.lax.Precision.HIGHEST) + bias[None]
        p = jax.nn.softmax(s, -1)
        ref = jnp.einsum("ghnm,ghmd->ghnd", p, vh,
                         precision=jax.lax.Precision.HIGHEST) \
            .transpose(0, 2, 1, 3).reshape(G, N, C)
        out = fused_window_attention(q, k, v, bias, None, num_heads=nh,
                                     scale=scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-5,
                                   err_msg=f"fp32 G={G} C={C} nh={nh}")
        outb = fused_window_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), bias, None, num_heads=nh, scale=scale)
        np.testing.assert_allclose(np.asarray(outb), np.asarray(ref),
                                   atol=6e-2, rtol=6e-2,
                                   err_msg=f"bf16 G={G} C={C} nh={nh}")
    return {"metric": "pallas_onchip_parity", "value": 1,
            "unit": "fp32+bf16 fused attention vs jnp, all ESC-Base "
                    "head geometries", "vs_baseline": 1}


ESC_BASE = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[45, 72, 96, 144, 192, 384], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[3, 6, 12, 24, 24], swin_depth=2, window_size=4,
    mlp_ratio=4.0, overlap=2, group_size=3, codebook_size=1024,
    codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
)


def bench_esc(config, name, B=16, L=47920, sr=16000, dtype=None):
    import jax

    from esc_tpu.models import ESC

    kw = {} if dtype is None else {"dtype": dtype}
    model = ESC(**config, **kw)
    model.init_params(example_len=L)
    rng = np.random.default_rng(53)
    x = jax.device_put(rng.standard_normal((B, L)).astype(np.float32))

    def roundtrip():
        _, _, recon = model.roundtrip(x, num_streams=6)
        return recon

    sec = _best_time(roundtrip)
    rtf = B * (L / sr) / sec
    return {"metric": f"{name}_rtf_per_chip", "value": round(rtf, 1),
            "unit": f"x_realtime (batch={B}, 3s clips, 9kbps)",
            "vs_baseline": round(rtf, 1)}


def bench_esc_latency(L=47920, sr=16000):
    """Batch-1 serving latency: ms to encode+decode ONE 3 s clip.
    `chained` amortizes the host fetch over the block (device-compute
    latency); `fetch_each` round-trips every clip's audio to the host
    through this environment's remote tunnel (upper bound)."""
    import jax
    import jax.numpy as jnp

    from esc_tpu.models import ESC

    model = ESC(**ESC_BASE)
    model.init_params(example_len=L)
    rng = np.random.default_rng(53)
    x = jax.device_put(rng.standard_normal((1, L)).astype(np.float32))
    chain = jax.jit(lambda x, r: x + 0.0 * r[0, 0])
    tap = jax.jit(lambda r: r[0, 0])

    _, _, r = model.roundtrip(x, num_streams=6)
    float(np.asarray(tap(chain(x, r))))

    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rr = r
        for _ in range(iters):
            _, _, rr = model.roundtrip(chain(x, rr), num_streams=6)
        float(np.asarray(tap(rr)))
        best = min(best, time.perf_counter() - t0)
    chained_ms = best / iters * 1e3

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        _, _, rr = model.roundtrip(x, num_streams=6)
        np.asarray(rr)  # full audio D2H
        times.append(time.perf_counter() - t0)
    fetch_ms = sorted(times)[len(times) // 2] * 1e3

    return {"metric": "esc_base_batch1_latency_ms",
            "value": round(chained_ms, 2),
            "unit": f"ms per 3s clip chained encode+decode (one-shot incl. "
                    f"full audio D2H via remote tunnel: {fetch_ms:.1f} ms)",
            "vs_baseline": round((L / sr) / (chained_ms / 1e3), 1)}


def bench_esc_batch_curve(L=47920, sr=16000):
    """RTF vs batch size: chained-serial vs pipelined (independent
    dispatches, one combined fetch)."""
    import jax
    import jax.numpy as jnp

    from esc_tpu.models import ESC

    model = ESC(**ESC_BASE)
    model.init_params(example_len=L)
    rng = np.random.default_rng(53)
    chain = jax.jit(lambda x, r: x + 0.0 * r[0, 0])
    tap = jax.jit(lambda r: r[0, 0])
    combine = jax.jit(lambda ts: jnp.stack(ts).sum())
    curve = {}
    for B in (1, 4, 8, 16, 32):
        x = jax.device_put(rng.standard_normal((B, L)).astype(np.float32))
        _, _, r0 = model.roundtrip(x, num_streams=6)
        float(np.asarray(tap(chain(x, r0))))
        iters = 10
        row = {}
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = r0
            for _ in range(iters):
                _, _, r = model.roundtrip(chain(x, r), num_streams=6)
            float(np.asarray(tap(r)))
            best = min(best, time.perf_counter() - t0)
        row["serial"] = round(iters * B * (L / sr) / best, 1)
        best = float("inf")
        for _ in range(2):
            taps = []
            t0 = time.perf_counter()
            for _ in range(iters):
                _, _, r = model.roundtrip(x, num_streams=6)
                taps.append(tap(r))
            float(np.asarray(combine(taps)))
            best = min(best, time.perf_counter() - t0)
        row["pipelined"] = round(iters * B * (L / sr) / best, 1)
        curve[B] = row
    b16 = curve[16]
    return {"metric": "esc_base_rtf_vs_batch",
            "value": b16["pipelined"],
            "unit": "x_realtime pipelined@16; full curve in extra",
            "vs_baseline": round(b16["pipelined"] / max(b16["serial"], 1e-9),
                                 2),
            "extra": curve}


def bench_esc_train(B=9, L=47920):
    import jax
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer

    model = ESC(**ESC_BASE)
    model.init_params(example_len=L)
    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4, total_steps=1000,
                                         warmup_steps=0), clip_norm=0.5)
    train_step = tr._make_step_fn(model.module)
    params = model.variables["params"]
    state = (params, tr.tx.init(params))
    rng = np.random.default_rng(53)
    batch = jax.device_put(
        (0.2 * rng.standard_normal((B, L))).astype(np.float32))
    ns = jax.numpy.asarray(6, jax.numpy.int32)

    state, aux = train_step(state, batch, ns, False)
    float(np.asarray(aux["loss"]))
    iters, blocks = 10, 3
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = train_step(state, batch, ns, False)
        float(np.asarray(aux["loss"]))  # chained through state; real fetch
        best = min(best, time.perf_counter() - t0)
    sec = best / iters
    ref_per_gpu = 4.34 * 36 / 4  # 39.06 samples/s per RTX 4090 (README:48)
    return {"metric": "esc_base_train_samples_per_s",
            "value": round(B / sec, 1),
            "unit": f"samples/s (batch {B}, step {sec * 1e3:.2f} ms)",
            "vs_baseline": round(B / sec / ref_per_gpu, 2)}


def bench_esc_train_packed_high(B=9, L=47920):
    """Quality-safe opt-in train config (packed window attention +
    3-pass-bf16 matmuls; README 'training') — measured in a SUBPROCESS
    because both knobs are trace/startup-time: toggling them in this
    process would silently reuse the already-compiled default step.
    """
    import subprocess

    env = dict(os.environ, ESC_TPU_PACKED_ATTN="1",
               JAX_DEFAULT_MATMUL_PRECISION="high")
    out = subprocess.run(
        [sys.executable, os.path.join("tools", "perf_ablation.py"),
         "--probe", "trainscan", "--B", str(B), "--L", str(L)],
        env=env, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("PROBE_RESULT"):
            ms = json.loads(line.split(None, 1)[1])["train_step_ms_sustained"]
            ref_per_gpu = 4.34 * 36 / 4
            sps = B / (ms / 1e3)
            return {"metric": "esc_base_train_samples_per_s_packed_high",
                    "value": round(sps, 1),
                    "unit": f"samples/s (batch {B}, step {ms:.2f} ms, "
                            "ESC_TPU_PACKED_ATTN=1 + "
                            "JAX_DEFAULT_MATMUL_PRECISION=high, the "
                            "measured quality-safe opt-in)",
                    "vs_baseline": round(sps / ref_per_gpu, 2)}
    raise RuntimeError(f"no PROBE_RESULT in perf_ablation output: "
                       f"{out.stdout[-300:]} {out.stderr[-300:]}")


def bench_dac(B=8, L=48000, sr=16000):
    import jax.numpy as jnp

    from esc_tpu.baselines.dac import DAC
    from esc_tpu.utils.config import read_yaml

    cfg = read_yaml("configs/dac/16khz_dns_9k_tiny.yml")["DAC"]
    dac = DAC(**cfg)
    dac.init_params(example_len=L)
    rng = np.random.default_rng(53)
    xj = jnp.asarray((0.2 * rng.standard_normal((B, L))).astype(np.float32))

    def roundtrip():
        codes = dac._encode_codes(dac.variables, xj, True)
        return dac._decode_codes(dac.variables, codes, True)

    sec = _best_time(roundtrip)
    rtf = B * (L / sr) / sec
    return {"metric": "dac_tiny_rtf_per_chip", "value": round(rtf, 1),
            "unit": f"x_realtime (batch={B}, 3s clips, 9kbps, 18 codebooks)",
            "vs_baseline": round(rtf, 1)}


def bench_encodec(B=8, L=72000, sr=24000):
    import jax.numpy as jnp

    from esc_tpu.baselines.encodec import Encodec
    from esc_tpu.baselines.encodec.model import (_encodec_decode_jit,
                                                 _encodec_encode_jit)

    enc = Encodec(sample_rate=24000, bandwidth=6.0)
    enc.init_params(example_len=L)
    rng = np.random.default_rng(53)
    xj = jnp.asarray((0.2 * rng.standard_normal((B, L))).astype(np.float32))

    def roundtrip():
        codes = _encodec_encode_jit(enc.module, enc.variables, xj, enc.n_q)
        return _encodec_decode_jit(enc.module, enc.variables, codes)

    sec = _best_time(roundtrip)
    rtf = B * (L / sr) / sec
    return {"metric": "encodec_rtf_per_chip", "value": round(rtf, 1),
            "unit": f"x_realtime (batch={B}, 3s clips, 24kHz, 6kbps)",
            "vs_baseline": round(rtf, 1)}


def main():
    results = []

    def _bf16():
        import jax.numpy as jnp

        return bench_esc(ESC_BASE, "esc_base_bf16", dtype=jnp.bfloat16)

    jobs = [
        ("pallas_parity", check_kernels_onchip),
        ("esc_base", lambda: bench_esc(ESC_BASE, "esc_base")),
        ("esc_base_latency", bench_esc_latency),
        ("esc_base_curve", bench_esc_batch_curve),
        ("esc_base_bf16", _bf16),
        ("esc_large", lambda: bench_esc({**ESC_BASE, "swin_depth": 4},
                                        "esc_large")),
        ("esc_train", bench_esc_train),
        ("esc_train_packed_high", bench_esc_train_packed_high),
        ("dac_tiny", bench_dac),
        ("encodec", bench_encodec),
    ]
    for name, job in jobs:
        try:
            r = job()
        except Exception as e:  # pragma: no cover - report and continue
            r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("BENCH_EXTRA.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
