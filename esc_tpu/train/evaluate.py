"""Batch evaluation sweep (mirrors scripts/test.py:22-55).

``eval_epoch`` runs the full codec forward at one or all bitrates over a
loader, collecting PESQ / Mel-Distance / SI-SDR per utterance plus the
codebook-entropy counter, and returns the same ``all_perf`` dict layout
as the reference (metric -> list over bitrates).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..metrics import EntropyCounter
from ..utils.host import to_host

__all__ = ["eval_epoch"]


def eval_epoch(model, eval_loader, metric_funcs: Dict,
               e_counter: EntropyCounter, bps_per_stream: float = 1.5,
               num_streams: Optional[int] = None, verbose: bool = True,
               dp=None):
    """Evaluate ``model`` (a codec wrapper) over ``eval_loader``.

    num_streams=None sweeps s = 1..max_streams (1.5 -> 9 kbps), matching
    scripts/test.py:30-31. Pass a :class:`esc_tpu.parallel.DataParallel`
    as ``dp`` to shard each eval batch across the mesh (params are
    replicated once; jit follows the input shardings).
    """
    if dp is not None and dp.num_devices > 1:
        model._ensure_init()
        model.variables = dp.replicate(model.variables)

    def _prep(x):
        if dp is not None and dp.num_devices > 1 \
                and x.shape[0] % dp.num_devices == 0:
            return dp.shard(x)
        return x

    try:
        spc = model._samples_per_code()
    except AttributeError:  # non-codec wrappers (tests)
        spc = None

    all_perf = {k: [] for k in metric_funcs}
    all_perf["utilization"] = []
    eval_range = (range(num_streams, num_streams + 1)
                  if num_streams is not None
                  else range(1, model.max_streams + 1))
    for s in eval_range:
        perf = {k: [] for k in metric_funcs}
        e_counter.reset_stats(num_streams=s)
        for batch in eval_loader:
            # padded eval collate yields (audio, lengths); training-style
            # collate yields a bare equal-length array
            x, lengths = batch if isinstance(batch, tuple) else (batch, None)
            out = model(_prep(x), None, num_streams=s)
            # recon/codes STAY on device: the jitted metrics consume them
            # in place and only per-sample scores cross to the host
            # (PESQ pulls the audio itself when its C lib is present).
            # Downloading recon here would cost two needless full-audio
            # transfers per batch (D2H + re-upload into the metric jits).
            recon, codes = out["recon_audio"], out["codes"]
            if lengths is not None:
                keep = lengths > 0  # drop final-batch padding rows
                for k, fn in metric_funcs.items():
                    vals = to_host(fn(x, recon, lengths))
                    perf[k].extend(vals[keep].tolist())
                codes_h = to_host(codes)
                if spc is None:
                    # model lacks _samples_per_code(): derive the frame
                    # hop from the padded length / code frames, so
                    # padding never silently inflates total_counts
                    spc = max(1, round(x.shape[-1] / codes_h.shape[-1]))
                e_counter.update(codes_h[keep], lengths=lengths[keep],
                                 samples_per_code=spc)
            else:
                for k, fn in metric_funcs.items():
                    perf[k].extend(to_host(fn(x, recon)).tolist())
                e_counter.update(codes)
        def _mean(v):  # all-NaN (e.g. PESQ lib absent) -> nan, silently
            v = np.asarray(v, dtype=np.float64)
            return float(np.nanmean(v)) if np.isfinite(v).any() else float("nan")

        for k, v in perf.items():
            all_perf[k].append(round(_mean(v), 4))
        rate, _ = e_counter.compute_utilization()
        all_perf["utilization"].append(rate)
        if verbose:
            print(f"Test Metrics at {s * bps_per_stream:.2f}kbps: ", end="")
            print(" | ".join(f"{k}: {_mean(v):.4f}"
                             for k, v in perf.items()),
                  f"| utilization: {rate:.4f}")
    return all_perf
