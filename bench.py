"""Benchmark: encode+decode real-time factor per chip (ESC-Base, 3 s clips).

North star (BASELINE.md): >= 1x real-time encode+decode per TPU chip at
1.5-9 kbps. The reference publishes no RTF, so vs_baseline is measured
against the 1.0x real-time bar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from esc_tpu.models import ESC

    config = dict(
        backbone="transformer", in_dim=2, in_freq=192,
        h_dims=[45, 72, 96, 144, 192, 384], max_streams=6,
        win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
        swin_heads=[3, 6, 12, 24, 24], swin_depth=2, window_size=4,
        mlp_ratio=4.0, overlap=2, group_size=3, codebook_size=1024,
        codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
    )

    # batch of 3 s EvalSet clips; 16 saturates the chip (throughput is
    # flat 16 -> 32, ~35% above batch 8)
    B, L, SR = 16, 47920, 16000
    num_streams = 6

    model = ESC(**config)
    model.init_params(example_len=L)

    rng = np.random.default_rng(53)
    x = rng.standard_normal((B, L)).astype(np.float32)

    # Warmup / compile the fused single-dispatch roundtrip.
    codes, feat_shape, recon = model.roundtrip(x, num_streams=num_streams)
    jax.block_until_ready(recon)

    def measure(iters, depth):
        """Sustained serving loop with up to ``depth`` batches in flight
        (esc_tpu.serving pattern): dispatch overlaps H2D + compute of
        later batches with completion of earlier ones. depth=1 is the
        fully serial loop (block every batch)."""
        from collections import deque
        inflight = deque()
        t0 = time.perf_counter()
        for _ in range(iters):
            _, _, r = model.roundtrip(x, num_streams=num_streams)
            inflight.append(r)
            if len(inflight) >= depth:
                jax.block_until_ready(inflight.popleft())
        while inflight:
            jax.block_until_ready(inflight.popleft())
        return time.perf_counter() - t0

    measure(4, 4)  # steady-state warmup
    iters, blocks = 20, 5
    audio_seconds = iters * B * (L / SR)
    best = {d: float("inf") for d in (1, 4)}
    for _ in range(blocks):
        for d in best:
            best[d] = min(best[d], measure(iters, d))
    serial_rtf = audio_seconds / best[1]
    rtf = audio_seconds / best[4]
    print(json.dumps({
        "metric": "encode_decode_rtf_per_chip",
        "value": round(rtf, 3),
        "unit": ("x_realtime sustained, 4 in flight (batch=16, 3s clips, "
                 f"9kbps, ESC-Base; serial {serial_rtf:.0f}x)"),
        "vs_baseline": round(rtf / 1.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
