"""k-means codebook initialization (working version of the reference's
dead code, esc/modules/vq/initialize.py)."""

import numpy as np
import jax.numpy as jnp

from esc_tpu.modules.vq_init import kmeans, kmeans_init_codebooks
from tests.test_model_shapes import TINY_CONFIG
from esc_tpu.models import make_model

L = 7920


def test_kmeans_converges(rng):
    # 3 well-separated blobs, k=3 -> centroids near blob means
    means = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    pts = np.concatenate([
        means[i] + 0.1 * rng.standard_normal((100, 2)).astype(np.float32)
        for i in range(3)])
    cents = np.asarray(kmeans(jnp.asarray(pts), jnp.int32(0), 3, 20))
    d = np.linalg.norm(cents[:, None] - means[None], axis=-1).min(0)
    assert (d < 0.5).all(), cents


def test_codebook_init_improves_commitment(rng):
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=L)
    x = (0.2 * rng.standard_normal((4, L))).astype(np.float32)

    before = float(model(x, None, num_streams=6)["cm_loss"].mean())
    kmeans_init_codebooks(model, x, iters=8)
    after = float(model(x, None, num_streams=6)["cm_loss"].mean())
    assert np.isfinite(after)
    assert after < before, (before, after)
