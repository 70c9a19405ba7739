"""Per-submodule matmul-precision policy (ESCModule.enc/dec_precision).

Round-3 recorded that flipping the GLOBAL matmul default to MXU-native
regresses training quality (tests/golden/precision_arms.json) even
though the loss-STFT/VQ GEMMs carry explicit HIGHEST — so the next
experiment is scoping: encoder at MXU-default, decoder at fp32. These
tests pin the mechanism (the scopes land on the right dots in the
lowered HLO; explicit per-op precisions are never overridden); the
quality verdict itself needs an on-chip arm (tools/quality_longrun.py
--enc-precision default).
"""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esc_tpu.models import ESC

CONFIG = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[12, 12, 16, 16, 24, 32], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[2, 2, 2, 2, 2], swin_depth=1, window_size=4,
    mlp_ratio=2.0, overlap=2, group_size=3, codebook_size=64,
    codebook_dims=[8] * 6, l2norm=True,
)
L = 4720


def _dot_precisions(model) -> Counter:
    x = jnp.zeros((1, L), jnp.float32)
    lowered = jax.jit(
        lambda v, xx: model.module.apply(
            v, xx, None, 6, False, True)["recon_audio"]
    ).lower(model.variables, x)
    return Counter(re.findall(r"precision = \[(\w+), (\w+)\]",
                              lowered.as_text()))


@pytest.fixture(scope="module")
def base():
    m = ESC(**CONFIG)
    m.init_params(example_len=L)
    return m


def test_no_policy_is_all_highest(base):
    """Package default: every dot rides fp32-highest."""
    precs = _dot_precisions(base)
    assert precs[("DEFAULT", "DEFAULT")] == 0, precs
    assert precs[("HIGHEST", "HIGHEST")] > 0


def test_enc_scope_lowers_encoder_dots_only(base):
    m = ESC(**CONFIG, enc_precision="default", dec_precision="highest")
    m.init_params(example_len=L)
    m.variables = base.variables
    precs = _dot_precisions(m)
    n_def, n_high = precs[("DEFAULT", "DEFAULT")], precs[("HIGHEST",
                                                          "HIGHEST")]
    assert n_def > 0, "encoder scope did not reach any dot"
    # decoder + explicit VQ-distance/STFT GEMMs must stay HIGHEST; the
    # decoder is the larger half, so HIGHEST dots must dominate
    assert n_high > n_def, precs


def test_explicit_ops_survive_full_default_scope(base):
    """Even with BOTH halves scoped to MXU-default, the explicit
    HIGHEST ops (VQ distances, STFT/mel GEMMs) keep their precision —
    the parity/quality-critical ops cannot be silently downgraded."""
    m = ESC(**CONFIG, enc_precision="default", dec_precision="default")
    m.init_params(example_len=L)
    m.variables = base.variables
    precs = _dot_precisions(m)
    assert precs[("HIGHEST", "HIGHEST")] > 0, precs


def test_policy_is_numerically_inert_on_cpu(base, rng):
    """On CPU the precision attribute does not change fp32 math — codes
    and waveforms must be identical, proving the policy changes only
    the precision annotation, not the computation graph."""
    m = ESC(**CONFIG, enc_precision="default", dec_precision="default")
    m.init_params(example_len=L)
    m.variables = base.variables
    x = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    c0, s0 = base.encode(x, num_streams=4)
    c1, s1 = m.encode(x, num_streams=4)
    assert tuple(s0) == tuple(s1)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    w0 = np.asarray(base.decode(c0, s0))
    w1 = np.asarray(m.decode(c1, s1))
    np.testing.assert_array_equal(w0, w1)
