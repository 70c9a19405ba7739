"""EnCodec baseline: converter golden parity vs the torch mirror, the
bandwidth->n_q rule, the comparison-wrapper interface, and the
windowed-sinc resampler."""

import numpy as np
import pytest

import jax.numpy as jnp

from esc_tpu.baselines.encodec import Encodec
from esc_tpu.baselines.encodec.convert import torch_to_encodec_params

SMALL = dict(dimension=8, n_filters=4, ratios=(2, 2), n_q=4, bins=16)


def _small_pair(seed=0):
    import torch

    from tests.torch_mirror_encodec import EncodecMirror

    torch.manual_seed(seed)
    mirror = EncodecMirror(**SMALL, lstm=2).eval()
    model = Encodec(bandwidth=1.5, **SMALL)
    model.init_params(example_len=32)
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    model.variables = torch_to_encodec_params(sd, model.module,
                                              model.variables)
    return mirror, model


def test_converter_codes_bit_exact():
    import torch

    mirror, model = _small_pair()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64)).astype(np.float32) * 0.3

    for n_q in (2, 4):
        ref = mirror.encode(torch.from_numpy(x), n_q).numpy()
        got = model.module.apply(model.variables, jnp.asarray(x), n_q,
                                 method="encode")
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_converter_decode_close():
    import torch

    mirror, model = _small_pair(seed=3)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 64)).astype(np.float32) * 0.3

    codes = mirror.encode(torch.from_numpy(x), 4)
    ref = mirror.decode(codes).numpy()
    got = model.module.apply(model.variables,
                             jnp.asarray(codes.numpy()), method="decode")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_bandwidth_to_nq():
    # 24k model: 75 frames/s x 10 bits = 750 bps per codebook
    model = Encodec(bandwidth=6.0)
    assert model.n_q == 8
    model.set_target_bandwidth(1.5)
    assert model.n_q == 2
    model.set_target_bandwidth(12.0)
    assert model.n_q == 16
    with pytest.raises(ValueError):
        model.set_target_bandwidth(48.0)


def test_wrapper_roundtrip_resamples():
    model = Encodec(bandwidth=1.5, **SMALL)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1
    out = model(x, sample_rate=16000)
    assert out.shape == x.shape
    assert np.all(np.isfinite(out))


def test_resample_sine_snr():
    from esc_tpu.ops.resample import resample

    sr_in, sr_out, f0 = 16000, 24000, 440.0
    t_in = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)

    y = np.asarray(resample(x, sr_in, sr_out))
    assert y.shape == (sr_out,)
    t_out = np.arange(sr_out) / sr_out
    ref = np.sin(2 * np.pi * f0 * t_out)
    # ignore filter-length edge transients
    m = slice(512, -512)
    err = y[m] - ref[m]
    snr = 10 * np.log10(np.mean(ref[m] ** 2) / np.mean(err ** 2))
    assert snr > 50.0, snr


def test_resample_roundtrip_identity():
    from esc_tpu.ops.resample import resample

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    # band-limit below the 16k/24k common Nyquist first
    x = np.asarray(resample(resample(x, 16000, 8000), 8000, 16000))
    y = np.asarray(resample(resample(x, 16000, 24000), 24000, 16000))
    m = (slice(None), slice(512, 3500))
    err = np.mean((y[m] - x[m]) ** 2) / np.mean(x[m] ** 2)
    assert err < 1e-3, err
