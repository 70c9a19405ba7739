"""Per-layer / per-op wall-time attribution for the ESC-Base forward.

step_breakdown.json (r5, on-chip) shows the model fwd+bwd matmuls own
~100% of the 493 ms train step while XLA cost analysis says the program
is only 1.27 TFLOPs (MFU 1.3%) — so the time is NOT in MXU FLOPs. This
tool finds the owner by timing, standalone and fetch-verified, each of:

  --probe scales   every encoder "down" + decoder "up" TransformerLayer
                   at its production geometry (fwd and grad), so the sum
                   can be compared against the whole-model fwd (161 ms).
  --probe micro    inside one SwinBlock at selected geometries: the qkv/
                   proj/mlp denses, the attention core (einsum path),
                   layernorm, and the window partition/roll/reverse data
                   movement — each as its own jitted program.
  --probe prec     one scale re-timed under matmul precision default vs
                   highest, to separate the 6-pass-emulation tax from
                   layout/data-movement cost.

Timing methodology: identical to tools/step_breakdown.py (chained taps,
one real host fetch per block, best-of-blocks).

Run (TPU): python tools/layer_breakdown.py --probe scales micro \
    --out artifacts/layer_breakdown.json
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

# (name, C_in, C_out, heads, H, W, scale)  — ESC-Base at B=9, 3 s clips
# (configs/9kbps_esc_base.yaml; esc_tpu/models/base.py:53-82).
ENC_LAYERS = [
    ("enc_pre", 45, 45, 3, 64, 300, None),
    ("enc_b0", 45, 72, 3, 64, 300, "down"),
    ("enc_b1", 72, 96, 6, 32, 300, "down"),
    ("enc_b2", 96, 144, 12, 16, 300, "down"),
    ("enc_b3", 144, 192, 24, 8, 300, "down"),
    ("enc_b4", 192, 384, 24, 4, 300, "down"),
]
DEC_LAYERS = [
    ("dec_b4", 384, 192, 24, 2, 300, "up"),
    ("dec_b3", 192, 144, 24, 4, 300, "up"),
    ("dec_b2", 144, 96, 12, 8, 300, "up"),
    ("dec_b1", 96, 72, 6, 16, 300, "up"),
    ("dec_b0", 72, 45, 3, 32, 300, "up"),
    ("dec_post", 45, 45, 3, 64, 300, None),
]


def _time_taps(fn, tap, iters=10, blocks=3):
    import jax
    import jax.numpy as jnp

    combine = jax.jit(lambda ts: jnp.stack(ts).sum())
    float(np.asarray(tap(fn())))
    best = float("inf")
    for _ in range(blocks):
        taps = []
        t0 = time.perf_counter()
        for _ in range(iters):
            taps.append(tap(fn()))
        float(np.asarray(combine(taps)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def probe_scales(B, iters):
    import jax
    import jax.numpy as jnp

    from esc_tpu.modules.transformer import TransformerLayer

    tap0 = jax.jit(lambda r: jnp.asarray(r).ravel()[0])
    rng = np.random.default_rng(0)
    rows = {}
    for name, ci, co, nh, H, W, scale in ENC_LAYERS + DEC_LAYERS:
        layer = TransformerLayer(ci, co, nh, depth=2, window_size=4,
                                 mlp_ratio=4.0, scale=scale,
                                 scale_factor=(2, 1))
        x = jax.device_put(rng.standard_normal(
            (B, H * W, ci)).astype(np.float32))
        params = layer.init(jax.random.PRNGKey(0), x, H, W)

        @jax.jit
        def fwd(p, xx, layer=layer, H=H, W=W):
            return layer.apply(p, xx, H, W)[0]

        rows[f"{name}_fwd_ms"] = round(
            _time_taps(lambda: fwd(params, x), tap0, iters), 2)

        gf = jax.jit(jax.value_and_grad(
            lambda p, xx, layer=layer, H=H, W=W:
            (layer.apply(p, xx, H, W)[0] ** 2).mean()))
        rows[f"{name}_grad_ms"] = round(
            _time_taps(lambda: gf(params, x)[0], tap0, iters), 2)
    rows["sum_fwd_ms"] = round(
        sum(v for k, v in rows.items() if k.endswith("_fwd_ms")), 2)
    rows["sum_grad_ms"] = round(
        sum(v for k, v in rows.items() if k.endswith("_grad_ms")), 2)
    return rows


def _micro_geometries():
    # pre-scale (largest token count, smallest C) and the two 24-head
    # scales (smallest head dims) and the bottleneck.
    return [("s45_64x300", 45, 3, 64, 300),
            ("s96_16x300", 96, 12, 16, 300),
            ("s192_4x300", 192, 24, 4, 300),
            ("s384_2x300", 384, 24, 2, 300)]


def probe_micro(B, iters):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from esc_tpu.modules.transformer import (swin_attention_mask,
                                             window_partition,
                                             window_reverse)

    tap0 = jax.jit(lambda r: jnp.asarray(r).ravel()[0])
    rng = np.random.default_rng(0)
    ws = 4
    rows = {}
    for name, C, nh, H, W, in _micro_geometries():
        hd = C // nh
        N = ws * ws
        Hp = -(-H // ws) * ws
        nW = (Hp // ws) * (W // ws)
        B_ = B * nW
        x_tok = jax.device_put(rng.standard_normal(
            (B, H * W, C)).astype(np.float32))
        x_win = jax.device_put(rng.standard_normal(
            (B_, N, C)).astype(np.float32))
        qkv_np = rng.standard_normal((B_, N, 3 * C)).astype(np.float32)
        qkv = jax.device_put(qkv_np)
        bias = jax.device_put(
            rng.standard_normal((nh, N, N)).astype(np.float32))

        # (a) qkv + proj + mlp denses on the window/token tensors
        dense = nn.Dense(3 * C)
        dp = dense.init(jax.random.PRNGKey(0), x_win)
        f_qkv = jax.jit(lambda p, xx: dense.apply(p, xx))
        rows[f"{name}_qkv_dense_ms"] = round(
            _time_taps(lambda: f_qkv(dp, x_win), tap0, iters), 2)

        class Mlp(nn.Module):
            @nn.compact
            def __call__(self, xx):
                xx = nn.Dense(4 * C)(xx)
                xx = nn.gelu(xx, approximate=False)
                return nn.Dense(C)(xx)

        mlp = Mlp()
        mp = mlp.init(jax.random.PRNGKey(0), x_tok)
        f_mlp = jax.jit(lambda p, xx: mlp.apply(p, xx))
        rows[f"{name}_mlp_ms"] = round(
            _time_taps(lambda: f_mlp(mp, x_tok), tap0, iters), 2)

        # (b) attention core alone (the XLA einsum path, incl. softmax)
        mask_np = swin_attention_mask(H, W, ws, ws // 2)

        @jax.jit
        def attn_core(qkv_in):
            q, k, v = [t.reshape(B_, N, nh, hd).transpose(0, 2, 1, 3)
                       for t in jnp.split(qkv_in, 3, axis=-1)]
            a = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                           preferred_element_type=jnp.float32)
            a = a + bias[None]
            m = jnp.asarray(mask_np)[None, :, None]
            a = a.reshape(B_ // nW, nW, nh, N, N) + m
            a = jax.nn.softmax(a.reshape(B_, nh, N, N), axis=-1)
            o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                           preferred_element_type=jnp.float32)
            return o.transpose(0, 2, 1, 3).reshape(B_, N, C)

        rows[f"{name}_attn_core_ms"] = round(
            _time_taps(lambda: attn_core(qkv), tap0, iters), 2)

        # (c) layernorm on the token tensor
        ln = nn.LayerNorm()
        lp = ln.init(jax.random.PRNGKey(0), x_tok)
        f_ln = jax.jit(lambda p, xx: ln.apply(p, xx))
        rows[f"{name}_layernorm_ms"] = round(
            _time_taps(lambda: f_ln(lp, x_tok), tap0, iters), 2)

        # (d) window partition + shift round-trip (pure data movement)
        @jax.jit
        def move(xx):
            y = xx.reshape(B, H, W, C)
            pad_b = (ws - H % ws) % ws
            if pad_b:
                y = jnp.pad(y, ((0, 0), (0, pad_b), (0, 0), (0, 0)))
            y = jnp.roll(y, shift=(-2, -2), axis=(1, 2))
            w = window_partition(y, ws).reshape(-1, N, C)
            y = window_reverse(w.reshape(-1, ws, ws, C), ws, Hp, W)
            y = jnp.roll(y, shift=(2, 2), axis=(1, 2))
            return y[:, :H].reshape(B, H * W, C)

        rows[f"{name}_datamove_ms"] = round(
            _time_taps(lambda: move(x_tok), tap0, iters), 2)
    return rows


def probe_prec(B, iters):
    """enc_b3 (144->192, nh=24, hd=6) fwd under both precisions."""
    import jax
    import jax.numpy as jnp

    from esc_tpu.modules.transformer import TransformerLayer

    tap0 = jax.jit(lambda r: jnp.asarray(r).ravel()[0])
    rng = np.random.default_rng(0)
    rows = {}
    layer = TransformerLayer(144, 192, 24, depth=2, window_size=4,
                             mlp_ratio=4.0, scale="down",
                             scale_factor=(2, 1))
    x = jax.device_put(rng.standard_normal(
        (B, 8 * 300, 144)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x, 8, 300)
    for prec in ("highest", "default"):
        with jax.default_matmul_precision(prec):
            f = jax.jit(lambda p, xx: layer.apply(p, xx, 8, 300)[0])
            rows[f"enc_b3_fwd_{prec}_ms"] = round(
                _time_taps(lambda: f(params, x), tap0, iters), 2)
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=9)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--probe", nargs="+",
                   default=["scales", "micro", "prec"])
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)

    import jax  # noqa: F401  (esc_tpu import pins matmul precision)
    import esc_tpu  # noqa: F401

    result = {"backend": jax.default_backend(), "B": a.B,
              "matmul_precision": "highest (esc_tpu default)"}
    t0 = time.perf_counter()
    if "scales" in a.probe:
        result["scales"] = probe_scales(a.B, a.iters)
    if "micro" in a.probe:
        result["micro"] = probe_micro(a.B, a.iters)
    if "prec" in a.probe:
        result["prec"] = probe_prec(a.B, a.iters)
    result["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(result, indent=1))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
