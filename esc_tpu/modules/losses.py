"""Generator losses (pure JAX functions + thin callables).

Mirrors esc/modules/loss/generator_loss.py: per-sample ``(B,)``
reductions throughout (the trainers weight and then ``.mean()``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.mel import mel_spectrogram, MEL_WINDOWS, MEL_BINS

__all__ = ["power_law", "complex_stft_loss", "mel_spectrogram_loss",
           "ComplexSTFTLoss", "MelSpectrogramLoss"]

POWER = 0.3


def power_law(stft: jnp.ndarray, power: float = POWER,
              eps: float = 1e-10) -> jnp.ndarray:
    """Signed power-law compression |x|^p * sign(x) (generator_loss.py:31-35)."""
    return jnp.sign(stft) * (jnp.abs(stft) + eps) ** power


def complex_stft_loss(raw_feat: jnp.ndarray, recon_feat: jnp.ndarray,
                      weight: float = 1.0,
                      use_power_law: bool = True) -> jnp.ndarray:
    """L2 on (power-law-compressed) complex STFTs, per-sample ``(B,)``.

    Mirrors ComplexSTFTLoss (generator_loss.py:12-29); inputs (B,2,F,T).
    """
    if use_power_law:
        raw_feat = power_law(raw_feat)
        recon_feat = power_law(recon_feat)
    return weight * jnp.mean((raw_feat - recon_feat) ** 2, axis=(1, 2, 3))


def mel_spectrogram_loss(raw_audio: jnp.ndarray, recon_audio: jnp.ndarray,
                         weight: float = 1.0, clamp_eps: float = 1e-5,
                         sample_rate: int = 16000) -> jnp.ndarray:
    """7-scale L1 mel magnitude + log-magnitude loss, per-sample ``(B,)``.

    Mirrors MelSpectrogramLoss (generator_loss.py:37-75).
    """
    loss = 0.0
    for w, m in zip(MEL_WINDOWS, MEL_BINS):
        x_m = mel_spectrogram(raw_audio, w, m, sample_rate)
        y_m = mel_spectrogram(recon_audio, w, m, sample_rate)
        loss += jnp.mean(jnp.abs(x_m - y_m), axis=(1, 2))
        lx = jnp.log10(jnp.clip(x_m, min=clamp_eps) ** 2)
        ly = jnp.log10(jnp.clip(y_m, min=clamp_eps) ** 2)
        loss += jnp.mean(jnp.abs(lx - ly), axis=(1, 2))
    return weight * loss


class ComplexSTFTLoss:
    """Callable wrapper matching the reference class interface."""

    def __init__(self, weight: float = 1.0, power_law: bool = True):
        self.weight = weight
        self.power_law = power_law

    def __call__(self, raw_feat, recon_feat):
        return complex_stft_loss(raw_feat, recon_feat, self.weight,
                                 self.power_law)


class MelSpectrogramLoss:
    """Callable wrapper matching the reference class interface."""

    def __init__(self, weight: float = 1.0, clamp_eps: float = 1e-5,
                 sample_rate: int = 16000):
        self.weight = weight
        self.clamp_eps = clamp_eps
        self.sample_rate = sample_rate

    def __call__(self, raw_audio, recon_audio):
        return mel_spectrogram_loss(raw_audio, recon_audio, self.weight,
                                    self.clamp_eps, self.sample_rate)
