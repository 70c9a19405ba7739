"""Generator losses (pure JAX functions + thin callables).

Mirrors esc/modules/loss/generator_loss.py: per-sample ``(B,)``
reductions throughout (the trainers weight and then ``.mean()``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.mel import mel_spectrogram, MEL_WINDOWS, MEL_BINS

__all__ = ["power_law", "complex_stft_loss", "mel_spectrogram_loss",
           "ComplexSTFTLoss", "MelSpectrogramLoss"]

POWER = 0.3
# Gradient-safety floor: d/dx (|x|+1e-10)^0.3 is ~0.3e7 at x=0, so a
# batch with digitally-silent stretches (exact-zero STFT bins) explodes
# the generator gradient by ~1e6x (measured: gradnorm 1e11 vs 1e5 on a
# silence-free corpus) and global clipping then erases the step. The
# reference (generator_loss.py:31-35) has the same singularity but its
# DNS recordings never contain exact zeros. We keep the FORWARD bit-
# identical and clamp only the derivative's |x| at GRAD_FLOOR — below
# the quietest content a 16-bit recording can represent, where the
# true derivative is astronomically large and carries no information.
GRAD_FLOOR = 1e-4


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def power_law(stft: jnp.ndarray, power: float = POWER,
              eps: float = 1e-10) -> jnp.ndarray:
    """Signed power-law compression |x|^p * sign(x) (generator_loss.py:31-35).

    Forward matches the reference exactly; the derivative is clamped at
    GRAD_FLOOR magnitude (see above) so digital silence cannot blow up
    training gradients.
    """
    return jnp.sign(stft) * (jnp.abs(stft) + eps) ** power


@power_law.defjvp
def _power_law_jvp(power, eps, primals, tangents):
    (stft,) = primals
    (dstft,) = tangents
    out = jnp.sign(stft) * (jnp.abs(stft) + eps) ** power
    mag = jnp.maximum(jnp.abs(stft), GRAD_FLOOR)
    d = power * (mag + eps) ** (power - 1.0)
    return out, d * dstft


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
