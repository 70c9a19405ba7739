"""Adversarial-stage stability regression (VERDICT r2 item 2).

The committed golden (tests/golden/adv_trajectory.json, produced by
`python tools/adv_trajectory.py` — 100 pretrain + 300 adversarial steps
with the reference weights mel 15 / gen 1 / feat 2 and clips 1e3/10) is
asserted structurally here, and a short live run re-checks that the GAN
stage trains without divergence on this backend.
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "adv_trajectory.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_golden_adv_trajectory_is_stable(golden):
    """The committed artifact: bounded losses, no NaN, quality at the
    end of the adversarial stage not degraded vs the pretrain endpoint."""
    traj = golden["trajectory"]
    adv = [t for t in traj if t["stage"] == "adv"]
    pre = [t for t in traj if t["stage"] == "pretrain"]
    assert adv and pre, "golden must cover both stages"
    for t in traj:
        for k, v in t.items():
            if isinstance(v, float):
                assert np.isfinite(v), (t["step"], k, v)
    # LS-GAN losses bounded: disc loss <= ~2 (sum over 4 discs of values
    # in [0,2] each would be 8; trained it sits near/below 1), gen loss
    # bounded by the same structure
    for t in adv:
        assert 0.0 <= t["disc_loss"] < 8.0, t
        assert 0.0 <= t["gen_loss"] < 8.0, t
        assert t["feat_loss"] >= 0.0, t
    # quality must not collapse: final MelDistance within 25% of the
    # pretrain endpoint (GAN stages trade a little spectral distance for
    # perceptual sharpness; divergence would blow it up)
    pre_end = pre[-1]["MelDistance"]
    adv_end = adv[-1]["MelDistance"]
    assert adv_end < pre_end * 1.25, (pre_end, adv_end)


@pytest.mark.slow
def test_adv_stage_short_run_is_stable(tmp_path):
    """Live CPU check: 10 pretrain + 20 adversarial steps of the real
    TrainerAdv step stay finite and bounded.

    Runs with FULL XLA optimizations: the suite-wide
    ``jax_disable_most_optimizations`` compile-speed flag (conftest.py)
    numerically destabilizes this particular graph — the second
    adversarial update turns finite ~4e5-norm generator grads into NaN
    params, while the identical sequence under production compilation
    (and the eager replay of the same update) is finite and decreasing.
    Recorded here so nobody re-discovers it: the flag is a test-env
    artifact, not a trainer bug."""
    import jax

    from tests.test_model_shapes import TINY_CONFIG
    from tools.adv_trajectory import run_adv_trajectory
    from tools.quality_trajectory import make_corpus

    corpus = tmp_path / "corpus"
    make_corpus(str(corpus))
    # jax 0.9 removed attribute access for unregistered flags; read()
    # is the stable API
    was = jax.config.read("jax_disable_most_optimizations")
    jax.config.update("jax_disable_most_optimizations", False)
    small_disc = {"sample_rate": 16000, "rates": [], "periods": [2, 3],
                  "fft_sizes": [512, 256],
                  "bands": [[0.0, 0.25], [0.25, 1.0]]}
    try:
        got = run_adv_trajectory(str(corpus), pretrain_steps=10,
                                 adv_steps=20, eval_every=10,
                                 model_config=TINY_CONFIG,
                                 disc_config=small_disc, batch_size=2)
    finally:
        jax.config.update("jax_disable_most_optimizations", was)
    traj = got["trajectory"]
    assert any(t["stage"] == "adv" for t in traj)
    for t in traj:
        for k, v in t.items():
            if isinstance(v, float):
                assert np.isfinite(v), (t["step"], k, v)
        if t["stage"] == "adv":
            assert 0.0 <= t["disc_loss"] < 8.0, t
