"""Golden tests for the STFT/ISTFT frontend against torch.stft/istft.

torchaudio.transforms.Spectrogram(power=None) is a thin wrapper over
torch.stft (center=True, reflect pad, periodic hann), so core torch is a
valid golden reference (reference: esc/models/base.py:22-47).
"""

import numpy as np
import pytest
import torch

from esc_tpu.ops.stft import stft, istft, spec_transform, audio_reconstruct

N_FFT, WIN, HOP = 382, 320, 80


def torch_stft(x):
    w = torch.hann_window(WIN, dtype=torch.float64)
    spec = torch.stft(torch.as_tensor(x, dtype=torch.float64), n_fft=N_FFT,
                      hop_length=HOP, win_length=WIN, window=w,
                      center=True, pad_mode="reflect", return_complex=True)
    return spec  # (B, F, T)


@pytest.mark.parametrize("L", [47920, 48000, 16000])
def test_stft_matches_torch(rng, L):
    x = rng.standard_normal((2, L)).astype(np.float32)
    ours = np.asarray(stft(x))  # (B, 2, F, T)
    ref = torch_stft(x)
    assert ours.shape == (2, 2, N_FFT // 2 + 1, L // HOP + 1)
    np.testing.assert_allclose(ours[:, 0], ref.real.numpy(), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(ours[:, 1], ref.imag.numpy(), atol=2e-3, rtol=1e-4)


def test_stft_3s_invariants(rng):
    # 3 s EvalSet clip: 48000-80 samples -> T=600 frames, F=192 bins
    # (reference: scripts/utils.py:40, SURVEY §6 invariants).
    x = rng.standard_normal((1, 47920)).astype(np.float32)
    ours = np.asarray(stft(x))
    assert ours.shape == (1, 2, 192, 600)


@pytest.mark.parametrize("L", [47920, 16000])
def test_istft_matches_torch(rng, L):
    x = rng.standard_normal((2, L)).astype(np.float32)
    ref_spec = torch_stft(x)
    spec = np.stack([ref_spec.real.numpy(), ref_spec.imag.numpy()], axis=1)
    spec = spec.astype(np.float32)

    ours = np.asarray(istft(spec))
    w = torch.hann_window(WIN, dtype=torch.float64)
    ref = torch.istft(ref_spec, n_fft=N_FFT, hop_length=HOP, win_length=WIN,
                      window=w, center=True)
    assert ours.shape == tuple(ref.shape)
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4, rtol=1e-4)


def test_roundtrip(rng):
    x = rng.standard_normal((2, 47920)).astype(np.float32)
    y = np.asarray(audio_reconstruct(spec_transform(x)))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_respects_length(rng):
    x = rng.standard_normal((1, 47920)).astype(np.float32)
    spec = spec_transform(x)
    y = istft(np.asarray(spec), length=47000)
    assert y.shape == (1, 47000)
