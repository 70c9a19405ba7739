"""Honest on-chip perf ablation (fetch-verified timing).

Round-2's perf narrative was built on `jax.block_until_ready`, which on
this environment's remote-TPU tunnel can return before device work
finishes — inflating numbers up to ~90x. This tool re-measures the real
levers in separate subprocesses (so env-level config like
JAX_DEFAULT_MATMUL_PRECISION takes effect cleanly):

  - matmul precision: highest (fp32 multi-pass) vs default (bf16 MXU)
  - fused Pallas window attention: on vs off (inference path)
  - param dtype: fp32 vs bf16
  - phase split: encode vs decode, forward vs train step

Timing: iterations chain on the previous output and each measurement
ends with a real np.asarray host fetch.

Run: python tools/perf_ablation.py            # full matrix
     python tools/perf_ablation.py --only rt  # roundtrip rows only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# ----------------------------------------------------------------- probes
def _probe_roundtrip(B, L, dtype_name):
    import jax
    import jax.numpy as jnp

    from esc_tpu.models import ESC
    from tools.quality_longrun import BASE_CONFIG

    kw = {"dtype": jnp.bfloat16} if dtype_name == "bf16" else {}
    model = ESC(**BASE_CONFIG, **kw)
    model.init_params(example_len=L)
    rng = np.random.default_rng(53)
    x = jax.device_put(rng.standard_normal((B, L)).astype(np.float32))
    chain = jax.jit(lambda x, r: x + 0.0 * r[0, 0])
    tap = jax.jit(lambda r: r[0, 0])

    _, _, r = model.roundtrip(x, num_streams=6)
    float(np.asarray(tap(chain(x, r))))
    iters, best = 10, float("inf")
    for _ in range(3):
        rr = r
        t0 = time.perf_counter()
        for _ in range(iters):
            _, _, rr = model.roundtrip(chain(x, rr), num_streams=6)
        float(np.asarray(tap(rr)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def _probe_encode_decode(B, L):
    import jax

    from esc_tpu.models import ESC
    from tools.quality_longrun import BASE_CONFIG

    model = ESC(**BASE_CONFIG)
    model.init_params(example_len=L)
    rng = np.random.default_rng(53)
    x = jax.device_put(rng.standard_normal((B, L)).astype(np.float32))

    codes, fs = model.encode(x, num_streams=6)
    rec = model.decode(codes, fs)
    float(np.asarray(rec[0, 0]))
    out = {}
    iters = 10
    chain_x = jax.jit(
        lambda x, c: x + 0.0 * c.ravel()[0].astype(x.dtype))
    best = float("inf")
    for _ in range(3):
        xx = x
        t0 = time.perf_counter()
        for _ in range(iters):
            codes, fs = model.encode(xx, num_streams=6)
            xx = chain_x(x, codes)
        float(np.asarray(codes.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    out["encode_ms"] = best / iters * 1e3
    chain_c = jax.jit(
        lambda c, r: c + (0.0 * r.ravel()[0]).astype(c.dtype))
    best = float("inf")
    for _ in range(3):
        cc = codes
        t0 = time.perf_counter()
        for _ in range(iters):
            rec = model.decode(cc, fs)
            cc = chain_c(codes, rec)
        float(np.asarray(rec[0, 0]))
        best = min(best, time.perf_counter() - t0)
    out["decode_ms"] = best / iters * 1e3
    return out


# MXU-aligned channel dims (DESIGN.md 9b): the reference h_dims
# 45/72/96 pad to the 128-wide MXU lanes; this variant rounds every
# stage to 64/128 boundaries (head_dim stays >= 12) to measure what the
# geometry alone costs. Params grow 8.4M -> ~11M; the row reports both.
TPU_GEOM = dict(
    h_dims=[64, 64, 128, 128, 192, 384],
    swin_heads=[4, 8, 8, 16, 24],
)


def _probe_trainstep(B, L, enc_prec=None, dec_prec=None, geom=None):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer
    from tools.quality_longrun import BASE_CONFIG

    cfg = dict(BASE_CONFIG)
    if geom == "tpu":
        cfg.update(TPU_GEOM)
    if enc_prec:
        cfg["enc_precision"] = enc_prec
    if dec_prec:
        cfg["dec_precision"] = dec_prec
    model = ESC(**cfg)
    model.init_params(example_len=L)
    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4, total_steps=1000,
                                         warmup_steps=0), clip_norm=0.5)
    step = tr._make_step_fn(model.module)
    params = model.variables["params"]
    state = (params, tr.tx.init(params))
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        (0.2 * rng.standard_normal((B, L))).astype(np.float32))
    ns = jnp.asarray(6, jnp.int32)
    state, aux = step(state, batch, ns, False)
    float(np.asarray(aux["loss"]))
    iters, best = 10, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, batch, ns, False)
        float(np.asarray(aux["loss"]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def _probe_train_scan(B, L, chunk=100, enc_prec=None, dec_prec=None,
                      geom=None):
    """Sustained train throughput: `chunk` steps fused in one lax.scan
    dispatch (the longrun's production mode). Measured round 4:
    sustained == per-dispatch (489 vs 493 ms at B=9, highest) — the
    remote-tunnel per-dispatch latency is ~4 ms/step, negligible. The
    row exists to PROVE that (an earlier session wrongly inferred
    ~120 ms sustained from longrun wall clocks — those train 0.5 s
    clips at batch 8, ~6.8x less work than this 3 s batch-9 geometry)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer, make_multi_step
    from tools.quality_longrun import BASE_CONFIG

    cfg = dict(BASE_CONFIG)
    if geom == "tpu":
        cfg.update(TPU_GEOM)
    if enc_prec:
        cfg["enc_precision"] = enc_prec
    if dec_prec:
        cfg["dec_precision"] = dec_prec
    model = ESC(**cfg)
    model.init_params(example_len=L)
    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 1e-4, total_steps=1000,
                                         warmup_steps=0), clip_norm=0.5)
    step = tr._make_step_fn(model.module)
    multi = make_multi_step(step.core, False)
    params = model.variables["params"]
    state = (params, tr.tx.init(params))
    rng = np.random.default_rng(0)
    batches = jax.device_put(
        (0.2 * rng.standard_normal((chunk, B, L))).astype(np.float32))
    ns = jnp.full((chunk,), 6, jnp.int32)
    state, auxs = multi(state, batches, ns)
    float(np.asarray(auxs["loss"])[-1])          # warm + fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, auxs = multi(state, batches, ns)  # chunk steps, chained
        float(np.asarray(auxs["loss"])[-1])      # real D2H fetch
        best = min(best, time.perf_counter() - t0)
    return best / chunk * 1e3


def run_probe(name, B, L, dtype_name, enc_prec=None, dec_prec=None,
              geom=None):
    if name == "rt":
        return {"roundtrip_ms": _probe_roundtrip(B, L, dtype_name)}
    if name == "encdec":
        return _probe_encode_decode(B, L)
    if name == "train":
        return {"train_step_ms": _probe_trainstep(
            B, L, enc_prec=enc_prec, dec_prec=dec_prec, geom=geom)}
    if name == "trainscan":
        return {"train_step_ms_sustained": _probe_train_scan(
            B, L, enc_prec=enc_prec, dec_prec=dec_prec, geom=geom)}
    raise SystemExit(f"unknown probe {name}")


# ------------------------------------------------------------ orchestrator
MATRIX = [
    # (tag, probe, B, L, env)
    ("rt_b16_highest_fused", "rt", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),  # heuristic gating
    ("rt_b16_highest_xla", "rt", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "ESC_TPU_FUSED_ATTN": "0"}),
    ("rt_b16_default_fused", "rt", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default"}),
    ("rt_b16_default_xla", "rt", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default", "ESC_TPU_FUSED_ATTN": "0"}),
    ("rt_b16_bf16_default_fused", "rt", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default", "DTYPE": "bf16"}),
    ("encdec_b16_highest", "encdec", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),
    ("encdec_b16_default", "encdec", 16, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default"}),
    ("train_b9_highest", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),
    ("train_b9_default", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default"}),
    # batch scaling: B=18 doubles the per-step MXU work (B>=32 is over
    # the remote compile helper's resource limit — see verify skill)
    ("train_b18_highest", "train", 18, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),
    ("train_b18_default", "train", 18, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default"}),
    # scoped policy (codecs.py enc_precision/dec_precision): bulk Swin
    # matmuls on the MXU, per-op HIGHEST kept on the VQ distance and
    # STFT/mel loss GEMMs — the selective arm from VERDICT r3 item 2
    ("train_b9_scoped_encdec", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest",
      "ENC_PREC": "default", "DEC_PREC": "default"}),
    ("train_b9_scoped_enc", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "ENC_PREC": "default"}),
    # MXU-aligned geometry (DESIGN.md 9b): what does the reference's
    # 45/72/96-wide padding actually cost vs 64/128-aligned dims?
    ("train_b9_tpugeom_highest", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "GEOM": "tpu"}),
    ("train_b9_tpugeom_scoped", "train", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "GEOM": "tpu",
      "ENC_PREC": "default", "DEC_PREC": "default"}),
    # sustained scan-mode throughput (production training mode): the
    # per-step rows above include ~370 ms remote-dispatch latency per
    # step; these are the honest per-device numbers vs the reference
    ("trainscan_b9_highest", "trainscan", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),
    ("trainscan_b9_default", "trainscan", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "default"}),
    # 'high' = bf16_3x emulation: half the passes of 'highest', pairs
    # with the armHigh3x quality arm (tools/r4c_session_queue.sh step 3)
    ("trainscan_b9_high", "trainscan", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "high"}),
    ("trainscan_b9_scoped_encdec", "trainscan", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest",
      "ENC_PREC": "default", "DEC_PREC": "default"}),
    ("trainscan_b9_tpugeom_scoped", "trainscan", 9, 47920,
     {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "GEOM": "tpu",
      "ENC_PREC": "default", "DEC_PREC": "default"}),
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--probe", help="(internal) run a single probe")
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--L", type=int, default=47920)
    p.add_argument("--dtype", default="fp32")
    p.add_argument("--enc-prec", default=None)
    p.add_argument("--dec-prec", default=None)
    p.add_argument("--geom", default=None)
    p.add_argument("--only", default=None,
                   help="substring filter over matrix tags")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)

    if a.probe:
        r = run_probe(a.probe, a.B, a.L, a.dtype,
                      enc_prec=a.enc_prec, dec_prec=a.dec_prec,
                      geom=a.geom)
        print("PROBE_RESULT " + json.dumps(r), flush=True)
        return 0

    results = {}
    for tag, probe, B, L, env in MATRIX:
        if a.only and a.only not in tag:
            continue
        child_env = {k: v for k, v in os.environ.items()
                     if k not in ("ESC_TPU_FUSED_ATTN",
                                  "JAX_DEFAULT_MATMUL_PRECISION")}
        _local = ("DTYPE", "ENC_PREC", "DEC_PREC", "GEOM")
        child_env.update({k: v for k, v in env.items()
                          if k not in _local})
        cmd = [sys.executable, os.path.abspath(__file__), "--probe", probe,
               "--B", str(B), "--L", str(L),
               "--dtype", env.get("DTYPE", "fp32")]
        if env.get("ENC_PREC"):
            cmd += ["--enc-prec", env["ENC_PREC"]]
        if env.get("DEC_PREC"):
            cmd += ["--dec-prec", env["DEC_PREC"]]
        if env.get("GEOM"):
            cmd += ["--geom", env["GEOM"]]
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              env=child_env, timeout=900)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("PROBE_RESULT ")]
        if proc.returncode != 0 or not line:
            results[tag] = {"error": proc.stderr[-500:]}
        else:
            results[tag] = json.loads(line[0][len("PROBE_RESULT "):])
            results[tag]["wall_s"] = round(time.perf_counter() - t0, 1)
        print(tag, json.dumps(results[tag]), flush=True)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
