"""Inference breakdown on the chip: where does the roundtrip time go?

Times (batch 16, 3 s clips): STFT, encoder, VQ chain (encode side),
decoder+ISTFT, and the fused roundtrip; optionally dumps a
jax.profiler trace for xprof.

    python tools/profile_infer.py [--trace /tmp/trace]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def best(fn, iters=20, blocks=5):
    """Fetch-verified pipelined timing: block_until_ready can return
    early on this environment's remote-TPU tunnel, so each block ends
    with a real scalar host fetch over every iteration's output."""
    import jax
    import jax.numpy as jnp

    tap = jax.jit(lambda r: jnp.ravel(r)[0])
    combine = jax.jit(lambda ts: jnp.stack(ts).sum())
    float(np.asarray(tap(fn())))
    t_best = float("inf")
    for _ in range(blocks):
        taps = []
        t0 = time.perf_counter()
        for _ in range(iters):
            taps.append(tap(fn()))
        float(np.asarray(combine(taps)))
        t_best = min(t_best, time.perf_counter() - t0)
    return t_best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from esc_tpu.models import ESC
    from esc_tpu.ops.stft import spec_transform
    from bench_all import ESC_BASE

    B, L = args.batch, 47920
    model = ESC(**ESC_BASE)
    model.init_params(example_len=L)
    mod, variables = model.module, model.variables
    rng = np.random.default_rng(53)
    x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))

    @jax.jit
    def spec(x):
        return spec_transform(x, mod.in_freq, mod.win_len, mod.hop_len,
                              mod.sr)

    @jax.jit
    def enc_hidden(x):
        feat = spec_transform(x, mod.in_freq, mod.win_len, mod.hop_len,
                              mod.sr)
        return mod.apply(
            variables, feat,
            method=lambda m, xf: m.encoder(xf, training=False))

    rt = lambda: model.roundtrip(x, num_streams=6)[2]
    enc = lambda: model.encode(x, num_streams=6)[0]

    rows = []
    try:
        rows.append(("stft", best(lambda: spec(x))))
    except Exception as e:
        print("stft probe skipped:", e)
    try:
        rows.append(("stft+encoder", best(lambda: enc_hidden(x)[0][-1])))
    except Exception as e:
        print("encoder probe skipped:", e)
    rows.append(("encode (stft+enc+vq-chain)", best(enc)))
    rows.append(("roundtrip", best(rt)))

    audio_s = B * L / 16000
    for name, sec in rows:
        print(f"{name:32s} {sec * 1e3:8.3f} ms   "
              f"({audio_s / sec:10.0f}x realtime)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(10):
                out = rt()
            np.asarray(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
