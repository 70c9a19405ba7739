"""Pallas codebook-argmin kernel vs the jnp reference path.

On CPU the kernel runs in interpreter mode — validates the tiling,
padding, and reduction logic; the TPU compile path is exercised by
bench.py / the compress CLI on hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from esc_tpu.ops.pallas.vq_kernels import codebook_argmin, _jnp_argmin


@pytest.mark.parametrize("N,d,K", [(300, 8, 1024), (256, 32, 1024),
                                   (7, 12, 128), (1000, 24, 64)])
def test_kernel_matches_jnp(rng, N, d, K):
    z = rng.standard_normal((N, d)).astype(np.float32)
    cb = rng.standard_normal((K, d)).astype(np.float32)
    ref = np.asarray(_jnp_argmin(jnp.asarray(z), jnp.asarray(cb)))
    out = np.asarray(codebook_argmin(jnp.asarray(z), jnp.asarray(cb),
                                     interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_tie_break_first_index(rng):
    # duplicate codebook rows -> argmin must return the FIRST of the tie
    # (torch .min(1).indices semantics, codebook.py:40)
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    cb[11] = cb[3]
    z = cb[np.array([3, 11, 5])] + 0.0
    out = np.asarray(codebook_argmin(jnp.asarray(z), jnp.asarray(cb),
                                     interpret=True))
    assert out.tolist() == [3, 3, 5]
