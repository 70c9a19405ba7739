"""Pure-function unit tests (SURVEY §4a): window partition/reverse and
pixel shuffle/unshuffle inverses, pre/post-process inverses, swin mask
vs the reference algorithm, framing/OLA duality.
"""

import numpy as np
import jax.numpy as jnp

from esc_tpu.modules.scale import pixel_shuffle, pixel_unshuffle
from esc_tpu.modules.transformer import (relative_position_index,
                                         swin_attention_mask,
                                         window_partition, window_reverse)
from esc_tpu.modules.vq import pre_process, post_process, split_dimension
from esc_tpu.ops.stft import frame_signal, overlap_add


def test_pixel_shuffle_inverse(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 12)).astype(np.float32))
    y = pixel_shuffle(pixel_unshuffle(x, (2, 1)), (2, 1))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y = pixel_unshuffle(pixel_shuffle(x, (2, 3)), (2, 3))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_window_partition_inverse(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 4, 4, 5)
    y = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_pre_post_process_inverse(rng):
    for dims, shape in [(3, (2, 4 * 10, 6)), (4, (2, 6, 4, 10))]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        z = pre_process(x, in_freq=4, overlap=2, fix_dim=24)
        assert z.shape == (2, 5, 48)
        y = post_process(z, in_freq=4, overlap=2, fix_dim=24, dims=dims)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_split_dimension():
    assert split_dimension(1536, 3) == [512, 512, 512]
    assert split_dimension(256, 3) == [85, 85, 86]  # remainder on last


def test_swin_mask_properties():
    m = swin_attention_mask(6, 10, 4, 2)
    Hp, Wp = 8, 12
    assert m.shape == (Hp // 4 * Wp // 4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # mask is symmetric in its zero pattern
    np.testing.assert_array_equal((m == 0), np.transpose(m == 0, (0, 2, 1)))
    # unshifted interior window: fully visible
    assert (m[0] == 0).all()


def test_relative_position_index_range():
    idx = relative_position_index(4, 4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49
    assert idx[0, 0] == idx[5, 5]  # same relative offset


def test_frame_overlap_duality(rng):
    # overlap_add(frame_signal(x)) with a boxcar equals per-sample overlap
    # counts times x (interior)
    x = jnp.asarray(rng.standard_normal((1, 1000)).astype(np.float32))
    frames = frame_signal(x, 200, 100, 9)
    y = np.asarray(overlap_add(frames, 100))[0]
    np.testing.assert_allclose(y[200:800], 2 * np.asarray(x)[0, 200:800],
                               rtol=1e-6)
