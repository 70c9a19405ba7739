"""Converter parity for the convolutional building blocks: torch
Conv2d / ConvTranspose2d / BatchNorm2d / PReLU weights mapped onto the
flax Convolution2D/ResidualUnit modules must reproduce torch outputs —
this is the path the conv-backbone ablations and the DAC decoder's
transposed convs depend on (transpose_kernel conventions!).
"""

import numpy as np
import torch
import torch.nn as nn

import jax
from esc_tpu.convert import torch_to_flax
from esc_tpu.modules.convolution import Convolution2D, ConvolutionLayer


class TorchConv2D(nn.Module):
    """Reference Convolution2D semantics (esc/modules/convolution/layers.py:3-28)."""

    def __init__(self, cin, cout, scale=True, transpose=False):
        super().__init__()
        stride = (2, 1) if scale else (1, 1)
        self.conv = (nn.Conv2d(cin, cout, (5, 2), stride, padding=(2, 1))
                     if not transpose else
                     nn.ConvTranspose2d(cin, cout, (5, 2), stride,
                                        padding=(1, 0)))
        self.transpose, self.scale = transpose, scale

    def forward(self, x):
        F, T = x.shape[-2], x.shape[-1]
        y = self.conv(x)
        if self.scale:
            y = y[..., : F * 2, :T] if self.transpose else y[..., : F // 2, :T]
        else:
            y = y[..., :F, :T]
        return y


def _convert_and_run(torch_mod, flax_mod, x_nchw, rng_key=0):
    variables = flax_mod.init(jax.random.PRNGKey(rng_key),
                              np.transpose(x_nchw, (0, 2, 3, 1)))
    # torch module name is "conv" to match the flax submodule path
    sd = {f"conv.{k}": v for k, v in torch_mod.conv.state_dict().items()}
    variables = torch_to_flax(sd, variables)
    y = flax_mod.apply(variables, np.transpose(x_nchw, (0, 2, 3, 1)))
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def test_conv2d_forward_parity(rng):
    torch.manual_seed(0)
    x = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)
    for scale in (True, False):
        tm = TorchConv2D(3, 5, scale=scale, transpose=False).eval()
        fm = Convolution2D(3, 5, (5, 2), scale=scale, transpose=False)
        ours = _convert_and_run(tm, fm, x)
        ref = tm(torch.from_numpy(x)).detach().numpy()
        assert ours.shape == ref.shape, (scale, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_transpose2d_forward_parity(rng):
    torch.manual_seed(1)
    x = rng.standard_normal((2, 4, 6, 10)).astype(np.float32)
    tm = TorchConv2D(4, 3, scale=True, transpose=True).eval()
    fm = Convolution2D(4, 3, (5, 2), scale=True, transpose=True)
    ours = _convert_and_run(tm, fm, x)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_layer_with_bn_prelu_parity(rng):
    """Full ConvolutionLayer (ResidualUnits + scaling conv + BN + PReLU)
    vs a torch mirror, eval mode (running stats)."""
    torch.manual_seed(2)

    class TorchResUnit(nn.Module):  # layers.py:30-46
        def __init__(self, dim):
            super().__init__()
            self.block = nn.Sequential(
                TorchConv2D(dim, dim, scale=False), nn.BatchNorm2d(dim),
                nn.PReLU(), TorchConv2D(dim, dim, scale=False),
                nn.BatchNorm2d(dim), nn.PReLU())

        def forward(self, x):
            return x + self.block(x)

    class TorchConvLayer(nn.Module):  # layers.py:49-63
        def __init__(self, cin, cout):
            super().__init__()
            self.blocks = nn.Sequential(
                TorchResUnit(cin), TorchConv2D(cin, cout, scale=True),
                nn.BatchNorm2d(cout), nn.PReLU())

        def forward(self, x):
            return self.blocks(x)

    tm = TorchConvLayer(4, 6)
    # make BN stats non-trivial
    tm.train()
    with torch.no_grad():
        for _ in range(3):
            tm(torch.from_numpy(
                rng.standard_normal((4, 4, 8, 10)).astype(np.float32)))
    tm.eval()

    fm = ConvolutionLayer(4, 6, depth=1, kernel_size=(5, 2),
                          transpose=False)
    x = rng.standard_normal((2, 4, 8, 10)).astype(np.float32)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = torch_to_flax(tm.state_dict(), variables)
    y = fm.apply(variables, x_nhwc, False)  # eval mode: running stats
    ours = np.transpose(np.asarray(y), (0, 3, 1, 2))
    ref = tm(torch.from_numpy(x)).detach().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)
