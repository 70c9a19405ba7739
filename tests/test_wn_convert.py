"""Weight-norm converter parity: torch weight_norm(Conv1d/ConvT1d) and
Snake1d parameters must map onto the flax DAC layers and reproduce
outputs exactly — the path reference DAC checkpoints load through.
"""

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils import weight_norm

import jax
from esc_tpu.baselines.dac.layers import (Snake1d, WNConv1d,
                                          WNConvTranspose1d, snake)
from esc_tpu.convert import torch_to_flax


def test_wn_conv1d_parity(rng):
    torch.manual_seed(0)
    tm = weight_norm(nn.Conv1d(4, 8, 7, stride=2, padding=3)).eval()
    fm = WNConv1d(8, kernel_size=7, stride=2, padding=3)

    x = rng.standard_normal((2, 4, 40)).astype(np.float32)
    x_nwc = np.transpose(x, (0, 2, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nwc)
    sd = {k: v for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd, variables)
    ours = np.transpose(np.asarray(fm.apply(variables, x_nwc)), (0, 2, 1))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_wn_conv_transpose1d_parity(rng):
    torch.manual_seed(1)
    tm = weight_norm(
        nn.ConvTranspose1d(6, 3, 8, stride=4, padding=2)).eval()
    fm = WNConvTranspose1d(3, kernel_size=8, stride=4, padding=2)

    x = rng.standard_normal((2, 6, 20)).astype(np.float32)
    x_nwc = np.transpose(x, (0, 2, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nwc)
    variables = torch_to_flax(dict(tm.state_dict()), variables)
    ours = np.transpose(np.asarray(fm.apply(variables, x_nwc)), (0, 2, 1))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_snake_alpha_parity(rng):
    # torch Snake1d: x + sin^2(alpha x)/(alpha + 1e-9), alpha (1, C, 1)
    C = 5
    alpha_t = np.abs(rng.standard_normal((1, C, 1))).astype(np.float32) + 0.5
    x = rng.standard_normal((2, C, 30)).astype(np.float32)
    ref = x + np.sin(alpha_t * x) ** 2 / (alpha_t + 1e-9)

    fm = Snake1d(C)
    x_nwc = np.transpose(x, (0, 2, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nwc)
    variables = torch_to_flax({"alpha": alpha_t}, variables)
    ours = np.transpose(np.asarray(fm.apply(variables, x_nwc)), (0, 2, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
