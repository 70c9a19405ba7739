"""Golden parity for the RVQ ablation family (rvq+swinT): torch mirror
checkpoint -> converter -> JAX RVQCodecs, codes bit-exact."""

import numpy as np
import pytest
import torch

from esc_tpu.convert import torch_to_flax
from esc_tpu.models import make_model

CONFIG = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[16, 16, 24, 24, 32, 64], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[2, 2, 4, 4, 4], swin_depth=1, window_size=4,
    mlp_ratio=2.0, overlap=2, group_size=3, num_rvqs=6,
    codebook_size=128, codebook_dim=8, l2norm=True,
)
L = 15920  # T=200 frames


@pytest.fixture(scope="module")
def pair():
    from tests.torch_mirror import RVQMirror
    torch.manual_seed(9)
    mirror = RVQMirror(**CONFIG).eval()
    model = make_model(CONFIG, "rvq+swinT")
    model.init_params(example_len=L)
    model.variables = torch_to_flax(mirror.state_dict(), model.variables)
    return mirror, model


@pytest.mark.parametrize("num_streams", [1, 4])
def test_rvq_codes_bit_exact(pair, rng, num_streams):
    mirror, model = pair
    x = (0.1 * rng.standard_normal((1, L))).astype(np.float32)
    ref_codes, ref_shape = mirror.encode(torch.from_numpy(x), num_streams)
    codes, shape = model.encode(x, num_streams=num_streams)
    assert tuple(shape) == tuple(ref_shape)
    assert np.asarray(codes).shape == tuple(ref_codes.shape)
    mismatch = (np.asarray(codes) != ref_codes.numpy()).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.2%}"


def test_rvq_waveform_parity(pair, rng):
    mirror, model = pair
    x = (0.1 * rng.standard_normal((1, L))).astype(np.float32)
    codes, shape = model.encode(x, num_streams=4)
    ours = np.asarray(model.decode(codes, shape))
    ref = mirror.decode(torch.from_numpy(np.asarray(codes)).long(),
                        shape).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4)
