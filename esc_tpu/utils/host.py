"""Device -> host transfer helper.

All device-to-host boundaries in the package funnel through
``to_host`` so transfers are explicit, auditable, and take PJRT's
batched ``device_get`` path. On tunnel-backed remote-TPU plugins the
D2H link is the scarce resource (measured ~25 ms latency + ~35 MB/s
steady-state here, with a multi-second first-transfer setup), so the
package policy is: move per-sample METRICS and codes across, keep
full-resolution audio on device unless the caller actually writes it
out (see esc_tpu/train/evaluate.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["to_host"]


def to_host(x) -> np.ndarray:
    """ndarray from ``x`` via one batched PJRT transfer; passes host
    arrays through at no cost."""
    if isinstance(x, np.ndarray):
        return x
    import jax

    return np.asarray(jax.device_get(x))
