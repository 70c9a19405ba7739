"""bfloat16 fast serving mode: same weights, bf16 compute dtype.

Params stay float32 (flax param_dtype default); matmuls/activations run
in bfloat16 — the MXU-native serving configuration. The mode must keep
(a) codes in near-total agreement with the float32 path (the VQ distance
kernel itself always computes in float32, esc_tpu/modules/vq.py), and
(b) the reconstructed waveform close to the float32 reconstruction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from esc_tpu.models import ESC

CONFIG = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[16, 16, 24, 24, 32, 64], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[2, 2, 4, 4, 4], swin_depth=2, window_size=4,
    mlp_ratio=2.0, overlap=2, group_size=3, codebook_size=128,
    codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
)
L = 15920


@pytest.fixture(scope="module")
def models():
    m32 = ESC(**CONFIG)
    m32.init_params(example_len=L)
    m16 = ESC(**CONFIG, dtype=jnp.bfloat16)
    m16.variables = m32.variables  # identical float32 weights
    return m32, m16


def test_bf16_params_are_float32(models):
    import jax

    _, m16 = models
    dtypes = {x.dtype for x in jax.tree.leaves(m16.variables["params"])}
    assert dtypes == {jnp.dtype(jnp.float32)}


def test_bf16_codes_mostly_agree(models, rng):
    m32, m16 = models
    x = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    c32, s32 = m32.encode(x, num_streams=6)
    c16, s16 = m16.encode(x, num_streams=6)
    assert tuple(s32) == tuple(s16)
    agree = (np.asarray(c32) == np.asarray(c16)).mean()
    # bf16 backbone features flip near-tie nearest-neighbor choices
    # (quality-neutral to first order; measured ~89% agreement on random
    # weights, higher on trained codebooks — see
    # tests/golden/bf16_quality.json for the trained-weights evidence)
    assert agree > 0.8, f"bf16/fp32 code agreement only {agree:.2%}"


def test_bf16_quality_neutral(models, rng):
    """The serving-mode contract: reconstruction *quality* (metric vs the
    input) matches float32, even where individual codes flip."""
    from esc_tpu.metrics import MelSpectrogramDistance

    m32, m16 = models
    x = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    _, _, r32 = m32.roundtrip(x, num_streams=6)
    _, _, r16 = m16.roundtrip(x, num_streams=6)
    r16 = np.asarray(r16)
    assert r16.dtype == np.float32  # ISTFT output stays float32
    assert np.isfinite(r16).all()
    mel = MelSpectrogramDistance()
    d32 = float(np.mean(mel(x, np.asarray(r32))))
    d16 = float(np.mean(mel(x, r16)))
    assert abs(d16 - d32) / d32 < 0.05, (
        f"bf16 MelDistance {d16:.4f} vs fp32 {d32:.4f}")


def test_bf16_trained_quality_artifact():
    """The committed TPU artifact (tools/bf16_quality.py) must show the
    bf16 serving mode quality-neutral on *trained* weights."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "bf16_quality.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no committed bf16 quality artifact")
    with open(path) as f:
        art = json.load(f)
    d32 = art["fp32"]["MelDistance"]
    d16 = art["bf16"]["MelDistance"]
    assert abs(d16 - d32) / d32 < 0.05
    assert art["bf16"]["SISDR"] > art["fp32"]["SISDR"] - 1.0
