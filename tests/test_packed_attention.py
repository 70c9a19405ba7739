"""packed_window_attention == the XLA einsum path, up to fp summation
order (masked logits are -1e9 -> exp underflows to exactly 0.0).

Covers: unshifted + shifted (SW-MSA mask), nW divisible / not divisible
by the pack factor (dummy pad windows), multiple head geometries from
the ESC-Base config (heads 3/hd 15, heads 12/hd 8, heads 24/hd 6), and
gradients through the packed path.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import esc_tpu  # noqa: F401,E402  (pins matmul precision = highest)
from esc_tpu.modules.transformer import (SwinBlock,  # noqa: E402
                                         swin_attention_mask,
                                         window_partition)

# (C, nh, H, W) — real ESC-Base block geometries (9kbps_esc_base.yaml)
GEOMS = [(45, 3, 8, 12), (96, 12, 16, 12), (144, 24, 8, 12)]


def _run_block(x, H, W, C, nh, shift, packed_on):
    old = os.environ.get("ESC_TPU_PACKED_ATTN")
    os.environ["ESC_TPU_PACKED_ATTN"] = "1" if packed_on else "0"
    try:
        blk = SwinBlock(d_model=C, num_heads=nh, window_size=4,
                        shift_size=shift, mlp_ratio=2.0)
        params = blk.init(jax.random.PRNGKey(0), x, H, W)
        out = blk.apply(params, x, H, W)

        def loss(p):
            return (blk.apply(p, x, H, W) ** 2).mean()

        grads = jax.grad(loss)(params)
        return np.asarray(out), jax.tree_util.tree_map(np.asarray, grads)
    finally:
        if old is None:
            os.environ.pop("ESC_TPU_PACKED_ATTN", None)
        else:
            os.environ["ESC_TPU_PACKED_ATTN"] = old


@pytest.mark.parametrize("C,nh,H,W", GEOMS)
@pytest.mark.parametrize("shift", [0, 2])
def test_packed_matches_xla_path(C, nh, H, W, shift):
    rng = np.random.default_rng(C + shift)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))
    ref_out, ref_g = _run_block(x, H, W, C, nh, shift, packed_on=False)
    got_out, got_g = _run_block(x, H, W, C, nh, shift, packed_on=True)
    np.testing.assert_allclose(got_out, ref_out, rtol=0, atol=2e-5)
    flat_r = jax.tree_util.tree_leaves(ref_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    for a, b in zip(flat_g, flat_r):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-5)


def test_packed_nondivisible_window_count():
    """H=4,W=12 -> nW=3 (not divisible by 8): dummy windows padded in
    and sliced out, output identical to the unpacked path."""
    C, nh, H, W = 72, 6, 4, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
    ref_out, _ = _run_block(x, H, W, C, nh, 2, packed_on=False)
    got_out, _ = _run_block(x, H, W, C, nh, 2, packed_on=True)
    np.testing.assert_allclose(got_out, ref_out, rtol=0, atol=2e-5)


def test_packed_full_model_codes_identical():
    """End-to-end: ESC codes with packed attention on == off (argmin
    over VQ distances is robust to the packed path's fp-order noise at
    these scales; this is the contract the serving path relies on)."""
    from esc_tpu.models import ESC
    from tests.test_model_shapes import TINY_CONFIG

    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)

    outs = {}
    for flag in ("0", "1"):
        os.environ["ESC_TPU_PACKED_ATTN"] = flag
        try:
            model = ESC(**TINY_CONFIG)
            model.init_params(example_len=16000, seed=3)
            codes, shape = model.encode(x, num_streams=3)
            outs[flag] = np.asarray(codes)
        finally:
            os.environ.pop("ESC_TPU_PACKED_ATTN", None)
    np.testing.assert_array_equal(outs["0"], outs["1"])
