"""Time the lax.scan multi-step path vs the single-step dispatch loop on
the longrun shapes (B=8, L=7920), fetch-verified.

Resolution of the round-3 "scan 12x slower" mystery: it never was. On
this environment's remote-TPU tunnel `jax.block_until_ready` can return
before device work finishes, so the 4.96 ms/step single-step readings
were fake; fetch-verified timing (np.asarray of the final loss, which
is a real host round-trip) shows both paths at ~64 ms/step at these
shapes — the honest device cost. See tools/perf_ablation.py.

Run: python tools/diag_scanspeed.py [--K 100]
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
    p.add_argument("--K", type=int, default=100)
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--L", type=int, default=7920)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from esc_tpu.models import ESC
    from esc_tpu.train.optim import make_optimizer, make_schedule
    from esc_tpu.train.trainer import Trainer, make_multi_step
    from tools.quality_longrun import BASE_CONFIG

    model = ESC(**BASE_CONFIG)
    model.init_params(example_len=a.L)

    tr = Trainer(SimpleNamespace(), SimpleNamespace(seed=53))
    tr.loss_weights = {"cm": 0.25, "cb": 1.0, "mel": 0.25, "stft": 1.0}
    tr.tx = make_optimizer(make_schedule("constant", 4e-4, total_steps=1000,
                                         warmup_steps=0), clip_norm=0.5)
    step = tr._make_step_fn(model.module)

    params_host = jax.device_get(model.variables["params"])

    def fresh_params():
        return jax.tree_util.tree_map(jnp.asarray, params_host)

    params = fresh_params()
    rng = np.random.default_rng(0)
    batch = (0.2 * rng.standard_normal((a.B, a.L))).astype(np.float32)
    ns = jnp.asarray(6, jnp.int32)

    # --- single-step loop (chained through state; real fetch at the end)
    state = (params, tr.tx.init(params))
    batch = jax.device_put(batch)
    state, aux = step(state, batch, ns, False)
    float(np.asarray(aux["loss"]))
    t0 = time.perf_counter()
    iters = a.K
    for _ in range(iters):
        state, aux = step(state, batch, ns, False)
    float(np.asarray(aux["loss"]))  # real D2H: proves completion
    t_single = (time.perf_counter() - t0) / iters
    print(f"single-step: {t_single * 1e3:.2f} ms/step")

    # --- scanned multi-step
    params = fresh_params()
    state = (params, tr.tx.init(params))
    multi = make_multi_step(step.core, freeze=False)
    stacked = jax.device_put(np.broadcast_to(
        batch, (a.K,) + np.shape(batch)).copy())
    ns_arr = jnp.full((a.K,), 6, jnp.int32)
    t0 = time.perf_counter()
    state, auxs = multi(state, stacked, ns_arr)
    float(np.asarray(auxs["loss"])[-1])
    t_compile = time.perf_counter() - t0
    print(f"scan K={a.K}: first call (compile+run) {t_compile:.1f} s")
    t0 = time.perf_counter()
    state, auxs = multi(state, stacked, ns_arr)
    float(np.asarray(auxs["loss"])[-1])  # real D2H
    t_scan = (time.perf_counter() - t0) / a.K
    print(f"scan K={a.K}: {t_scan * 1e3:.2f} ms/step "
          f"({t_scan / t_single:.1f}x single)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
