"""On-chip microbench: fused window attention vs XLA at a given
geometry. Used to (re)decide fused_attention_profitable gates — e.g.
VERDICT r2 item 9: does the padded-head path (nh=24/hd=8 -> 32 heads,
two lane-aligned 128-channel groups) beat the XLA einsum where the 4D
fallback measured ~1.0x?

Run: python tools/bench_attention_geom.py [--G 2400] [--C 192] [--nh 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--G", type=int, default=2400)
    p.add_argument("--N", type=int, default=16)
    p.add_argument("--C", type=int, default=192)
    p.add_argument("--nh", type=int, default=24)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from esc_tpu.ops.pallas.attention_kernels import fused_window_attention

    G, N, C, nh = a.G, a.N, a.C, a.nh
    hd = C // nh
    scale = hd ** -0.5
    rng = np.random.default_rng(0)
    dt = jnp.float32 if a.dtype == "f32" else jnp.bfloat16
    q, k, v = (jnp.asarray(rng.standard_normal((G, N, C)),
                           jnp.float32).astype(dt) for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((nh, N, N)), jnp.float32)

    @jax.jit
    def xla_path(q, k, v):
        qh = q.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("ghnd,ghmd->ghnm", qh * scale, kh,
                       preferred_element_type=jnp.float32)
        s = s + bias[None].astype(s.dtype)
        p_ = jax.nn.softmax(s, -1)
        o = jnp.einsum("ghnm,ghmd->ghnd", p_.astype(q.dtype), vh,
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(G, N, C)

    @jax.jit
    def fused_path(q, k, v):
        return fused_window_attention(q, k, v, bias, None, num_heads=nh,
                                      scale=scale)

    # fetch-verified timing: chain iterations through the output and end
    # with a real np.asarray host fetch (block_until_ready can return
    # early on this environment's remote-TPU tunnel)
    chain = jax.jit(lambda q, r: q + (0.0 * r.ravel()[0]).astype(q.dtype))
    def best(fn):
        float(np.asarray(fn(q, k, v).ravel()[0]))
        b = float("inf")
        for _ in range(5):
            qq = q
            t0 = time.perf_counter()
            for _ in range(a.iters):
                out = fn(qq, k, v)
                qq = chain(q, out)
            float(np.asarray(out.ravel()[0]))
            b = min(b, (time.perf_counter() - t0) / a.iters)
        return b

    tx = best(xla_path)
    tf = best(fused_path)
    print(f"G={G} N={N} C={C} nh={nh} hd={hd} dtype={a.dtype}: "
          f"xla {tx * 1e6:.1f}us  fused {tf * 1e6:.1f}us  "
          f"speedup {tx / tf:.2f}x")
    # numeric sanity on-chip
    o1 = np.asarray(xla_path(q, k, v), np.float32)
    o2 = np.asarray(fused_path(q, k, v), np.float32)
    err = np.abs(o1 - o2).max()
    print(f"max abs diff vs XLA: {err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
