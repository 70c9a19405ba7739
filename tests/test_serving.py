"""esc_tpu.serving: bounded in-flight pipelining semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from esc_tpu.serving import stream_map


def test_stream_map_order_and_values():
    xs = [np.full((2, 3), i, np.float32) for i in range(7)]
    outs = list(stream_map(lambda x: jnp.asarray(x) + 1, xs, depth=3))
    assert len(outs) == 7
    for i, o in enumerate(outs):
        assert isinstance(o, np.ndarray)
        np.testing.assert_array_equal(o, xs[i] + 1)


def test_stream_map_depth_one_is_serial_and_device_mode():
    xs = [np.ones((2,), np.float32) * i for i in range(3)]
    outs = list(stream_map(lambda x: jnp.asarray(x) * 2, xs, depth=1,
                           to_host=False))
    assert len(outs) == 3
    assert not isinstance(outs[0], np.ndarray)  # device array yielded
    np.testing.assert_array_equal(np.asarray(outs[2]), xs[2] * 2)


def test_stream_map_tree_outputs():
    xs = [np.ones((2,), np.float32) * i for i in range(4)]
    outs = list(stream_map(lambda x: {"a": jnp.asarray(x),
                                      "b": (jnp.asarray(x) + 1,)},
                           xs, depth=2))
    assert outs[3]["a"][0] == 3.0 and outs[3]["b"][0][0] == 4.0


def test_stream_map_rejects_bad_depth():
    with pytest.raises(ValueError):
        list(stream_map(lambda x: x, [1], depth=0))
