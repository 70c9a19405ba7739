"""On-chip Pallas-kernel parity (ADVICE r2: interpret-mode CI can't see
Mosaic lowering bugs). Runs every ESC-Base head geometry through
``fused_window_attention`` vs the unfused XLA einsum on the REAL TPU —
fp32 (expected bit-exact: HIGHEST precision both paths) and bf16
(MXU-native, fp32 softmax; bounded drift) — masked and unmasked, plus
the Pallas codebook-argmin kernel vs its jnp reference.

Prints one JSON line; non-zero exit on any mismatch. Run whenever the
kernels change: ``python tools/tpu_parity.py``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# (num_heads, head_dim) per ESC-Base swin stage (configs/9kbps_esc_base.yaml:
# swin_heads [3,6,12,24,24] over h_dims -> C in {72,96,144,192,384})
ESC_GEOMETRIES = [(3, 24), (6, 16), (12, 12), (24, 8), (24, 16)]
N = 16  # 4x4 window


def check_attention(results) -> bool:
    import jax
    import jax.numpy as jnp

    from esc_tpu.ops.pallas.attention_kernels import fused_window_attention

    ok = True
    rng = np.random.default_rng(0)
    for nh, hd in ESC_GEOMETRIES:
        C = nh * hd
        G = 2048  # enough windows that the kernel tiles fully
        scale = hd ** -0.5
        q32, k32, v32 = (jnp.asarray(
            rng.standard_normal((G, N, C)), jnp.float32) for _ in range(3))
        bias = jnp.asarray(rng.standard_normal((nh, N, N)) * 0.1, jnp.float32)
        mask_np = np.zeros((8, N, N), np.float32)
        mask_np[:, : N // 2, N // 2:] = -100.0
        mask_np[:, N // 2:, : N // 2] = -100.0
        # fp32: the fused kernel and XLA HIGHEST einsum accumulate in
        # different orders on-chip -> last-ulp drift (~1.5e-6 observed),
        # NOT bit-exact like interpret mode; bf16 tolerance covers MXU
        # rounding with fp32 softmax/accumulate.
        for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 3e-2)):
            q, k, v = (t.astype(dt) for t in (q32, k32, v32))
            for mask in (None, jnp.tile(jnp.asarray(mask_np), (G // 8, 1, 1))):
                def ref(q, k, v):
                    qh = q.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
                    kh = k.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
                    vh = v.reshape(G, N, nh, hd).transpose(0, 2, 1, 3)
                    prec = ("highest" if dt == jnp.float32 else None)
                    s = jnp.einsum("ghnd,ghmd->ghnm", qh * scale, kh,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
                    s = s + bias[None]
                    if mask is not None:
                        s = s + mask.reshape(G, 1, N, N)
                    p = jax.nn.softmax(s, -1)
                    o = jnp.einsum("ghnm,ghmd->ghnd", p.astype(dt), vh,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
                    return o.transpose(0, 2, 1, 3).reshape(G, N, C)

                o_ref = np.asarray(jax.jit(ref)(q, k, v), np.float32)
                o_fus = np.asarray(jax.jit(
                    lambda q, k, v: fused_window_attention(
                        q, k, v, bias, mask, num_heads=nh, scale=scale)
                )(q, k, v), np.float32)
                err = float(np.abs(o_ref - o_fus).max())
                key = (f"attn_nh{nh}_hd{hd}_"
                       f"{'bf16' if dt == jnp.bfloat16 else 'f32'}"
                       f"{'_masked' if mask is not None else ''}")
                results[key] = err
                if err > tol:
                    ok = False
    return ok


def check_vq_argmin(results) -> bool:
    import jax
    import jax.numpy as jnp

    from esc_tpu.ops.pallas.vq_kernels import codebook_argmin, _jnp_argmin

    rng = np.random.default_rng(1)
    ok = True
    for n, K, d in ((4096, 1024, 8), (1200, 1024, 8)):
        z = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        cb = jnp.asarray(rng.standard_normal((K, d)), jnp.float32)
        # include exact duplicate rows so the lowest-index tie-break is hit
        cb = cb.at[17].set(cb[3]).at[901].set(cb[3])
        got = np.asarray(jax.jit(codebook_argmin)(z, cb))
        ref = np.asarray(jax.jit(_jnp_argmin)(z, cb))
        mismatches = int((got != ref).sum())
        results[f"vq_argmin_n{n}_mismatches"] = mismatches
        if mismatches:
            ok = False
    return ok


def main() -> int:
    import jax

    results = {"backend": jax.default_backend()}
    if results["backend"] != "tpu":
        print(json.dumps({**results, "status": "SKIP (not on TPU)"}))
        return 0
    ok = check_attention(results) & check_vq_argmin(results)
    results["status"] = "OK" if ok else "MISMATCH"
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
