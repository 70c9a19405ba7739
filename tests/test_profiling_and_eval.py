"""Profiling utilities + sharded eval smoke tests."""

import os

import numpy as np

from esc_tpu.metrics import EntropyCounter, MelSpectrogramDistance, SISDR
from esc_tpu.parallel import DataParallel
from esc_tpu.train.evaluate import eval_epoch
from esc_tpu.utils.profiling import StepTimer, trace
from esc_tpu.models import make_model
from tests.test_model_shapes import TINY_CONFIG


def test_step_timer():
    import time
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tic()
        time.sleep(0.002)
        t.toc()
    s = t.summary()
    assert 0.001 < s["step_time_mean_s"] < 0.2
    assert s["steps_per_s"] > 5


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp
    with trace(str(tmp_path)):
        _ = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if "trace" in f or f.endswith(".pb")
                  or f.endswith(".json.gz")]
    assert found, "no trace artifacts written"


def test_sharded_eval_matches_single(rng):
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=7920)
    batches = [(0.2 * rng.standard_normal((8, 7920))).astype(np.float32)]
    metrics = {"MelDistance": MelSpectrogramDistance(), "SISDR": SISDR()}

    e1 = EntropyCounter(TINY_CONFIG["codebook_size"], 6, 3)
    p1 = eval_epoch(model, batches, metrics, e1, num_streams=2,
                    verbose=False)
    e2 = EntropyCounter(TINY_CONFIG["codebook_size"], 6, 3)
    p2 = eval_epoch(model, batches, metrics, e2, num_streams=2,
                    verbose=False, dp=DataParallel())
    assert p1["utilization"] == p2["utilization"]
    for k in metrics:
        np.testing.assert_allclose(p1[k], p2[k], atol=1e-3)
