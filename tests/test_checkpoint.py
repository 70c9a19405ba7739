"""Checkpoint save/restore round-trip and torch-state export/import."""

import numpy as np
import jax

from esc_tpu.checkpoint import load_checkpoint, restore_into, save_checkpoint
from esc_tpu.models import make_model
from tests.test_model_shapes import TINY_CONFIG

L = 7920


def test_checkpoint_roundtrip(tmp_path, rng):
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=L)
    params = model.variables["params"]

    path = save_checkpoint(str(tmp_path), "best.ckpt", step=123,
                           model_state=params, best_perf=3.21)
    payload = load_checkpoint(path)
    assert payload["step"] == 123
    assert abs(payload["best_perf"] - 3.21) < 1e-6

    restored = restore_into(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["model_state_dict"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # behavior round-trips too
    x = (0.1 * rng.standard_normal((1, L))).astype(np.float32)
    codes_before, _ = model.encode(x, num_streams=2)
    model.variables = {"params": restored["model_state_dict"]}
    codes_after, _ = model.encode(x, num_streams=2)
    np.testing.assert_array_equal(np.asarray(codes_before),
                                  np.asarray(codes_after))


def test_torch_state_export_import_roundtrip():
    from esc_tpu.convert import flax_to_torch, torch_to_flax
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=L)
    sd = flax_to_torch(model.variables)
    assert any(k.startswith("encoder.patch_embed.proj") for k in sd)
    restored = torch_to_flax(sd, model.variables)
    for a, b in zip(jax.tree_util.tree_leaves(model.variables["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
