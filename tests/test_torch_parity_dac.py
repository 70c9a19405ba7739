"""Golden parity for the DAC baseline: torch mirror state dict ->
converter -> flax DAC; codes bit-exact, waveforms within tolerance.
Validates the full weight-norm/snake/Conv1d/ConvTranspose1d conversion
path that released DAC checkpoints load through.
"""

import numpy as np
import pytest
import torch

from esc_tpu.baselines.dac import DAC
from esc_tpu.convert import torch_to_flax

CFG = dict(encoder_dim=8, encoder_rates=[2, 4, 5, 8], decoder_dim=96,
           decoder_rates=[8, 5, 4, 2], n_codebooks=4, codebook_size=64,
           codebook_dim=4)
L = 16000


@pytest.fixture(scope="module")
def pair():
    from tests.torch_mirror_dac import DACMirror
    torch.manual_seed(4)
    mirror = DACMirror(**CFG).eval()
    model = DAC(sample_rate=16000, quantizer_dropout=0.0, **CFG)
    model.init_params(example_len=L)
    model.variables = torch_to_flax(mirror.state_dict(), model.variables)
    return mirror, model


def test_dac_codes_bit_exact(pair, rng):
    mirror, model = pair
    x = (0.2 * rng.standard_normal((2, L))).astype(np.float32)
    ref = mirror.encode(torch.from_numpy(x), 4).numpy()
    out = model(x)  # full forward; codes in the output dict
    codes = np.asarray(out["codes"])
    assert codes.shape == ref.shape
    mismatch = (codes != ref).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.2%}"


def test_dac_waveform_parity(pair, rng):
    mirror, model = pair
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)
    codes = mirror.encode(torch.from_numpy(x), 4)
    ref = mirror.decode_codes(codes).numpy()
    ours = np.asarray(model._decode_codes(
        model.variables, np.asarray(codes), True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)
