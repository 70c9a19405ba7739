"""Golden parity: torch mirror checkpoint -> converter -> JAX model.

The BASELINE.json north star: codes bit-exact against the PyTorch
reference via the weight converter, waveforms within float tolerance.
Uses the compact torch mirror (tests/torch_mirror.py) in place of the
unimportable reference repo.
"""

import numpy as np
import pytest
import torch

from esc_tpu.convert import torch_to_flax, flax_to_torch
from esc_tpu.models import ESC

CONFIG = dict(
    backbone="transformer", in_dim=2, in_freq=192,
    h_dims=[16, 16, 24, 24, 32, 64], max_streams=6,
    win_len=20, hop_len=5, sr=16000, patch_size=[3, 2],
    swin_heads=[2, 2, 4, 4, 4], swin_depth=2, window_size=4,
    mlp_ratio=2.0, overlap=2, group_size=3, codebook_size=128,
    codebook_dims=[8, 8, 8, 8, 8, 8], l2norm=True,
)
L = 15920  # ~1 s -> T=200 frames, tokens (64, 100)


@pytest.fixture(scope="module")
def pair():
    from tests.torch_mirror import ESCMirror
    torch.manual_seed(5)
    mirror = ESCMirror(**CONFIG).eval()
    model = ESC(**CONFIG)
    model.init_params(example_len=L)
    model.variables = torch_to_flax(mirror.state_dict(), model.variables)
    return mirror, model


def test_state_dicts_cover_each_other(pair):
    mirror, model = pair
    sd = mirror.state_dict()
    ours = flax_to_torch(model.variables)
    torch_keys = {k for k in sd if "relative_position_index" not in k}
    assert torch_keys == set(ours.keys())
    for k in torch_keys:
        np.testing.assert_allclose(sd[k].numpy(), ours[k], atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("num_streams", [1, 3, 6])
def test_codes_bit_exact(pair, rng, num_streams):
    mirror, model = pair
    x = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    ref_codes, ref_shape = mirror.encode(torch.from_numpy(x), num_streams)
    codes, shape = model.encode(x, num_streams=num_streams)
    assert tuple(shape) == tuple(ref_shape)
    assert np.asarray(codes).shape == tuple(ref_codes.shape)
    mismatch = (np.asarray(codes) != ref_codes.numpy()).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.2%}"


def test_waveform_parity(pair, rng):
    mirror, model = pair
    x = (0.1 * rng.standard_normal((1, L))).astype(np.float32)
    codes, shape = model.encode(x, num_streams=6)
    ours = np.asarray(model.decode(codes, shape))
    ref = mirror.decode(torch.from_numpy(np.asarray(codes)).long(),
                        shape).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)
