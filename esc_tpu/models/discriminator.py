"""Multi-period / multi-scale / multi-resolution waveform discriminator.

Re-design of esc/models/discriminator.py (itself DAC's) for flax/TPU:

* MPD: period-folded 2D conv stacks (periods 2,3,5,7,11)
* MSD: raw-waveform 1D conv stacks at decimated rates (disabled by the
  reference adversarial config, ``rates: []``)
* MRD: complex-STFT band-split 2D conv stacks (ffts 2048/1024/512)

All convolutions are weight-normalized (flax nn.WeightNorm == torch
weight_norm over per-output-channel vectors) with LeakyReLU(0.1).
The MRD spectrogram mirrors audiotools' ``match_stride`` STFT framing:
hop = window/4, reflect padding of (window-hop)/2 plus right padding to
a whole number of hops, giving exactly ceil(L/hop) frames.

Each sub-discriminator returns its feature-map list; the combined
Discriminator returns a list of those lists (fmaps), with the final
element of each being the logit map — the layout GANLoss consumes.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resample import resample_julius
from ..ops.stft import _dft_matrices, frame_signal

__all__ = ["Discriminator", "MPD", "MSD", "MRD", "BANDS"]

BANDS = [(0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]


class WNConv(nn.Module):
    """One weight-normalized conv in its own module scope, so the param
    tree is ``<name>/Conv_0/kernel`` + ``<name>/wn/Conv_0/kernel/scale``
    — the layout esc_tpu.convert maps onto torch ``weight_v``/``weight_g``
    (same pattern as baselines/dac/layers.py)."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Any
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.WeightNorm(
            nn.Conv(self.features, kernel_size=self.kernel_size,
                    strides=self.strides, padding=self.padding,
                    feature_group_count=self.feature_group_count),
            name="wn")(x)


def _wn_conv(features, kernel_size, strides, padding, feature_group_count=1,
             name=None):
    return WNConv(features, tuple(kernel_size), tuple(strides), padding,
                  feature_group_count, name=name)


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class MPD(nn.Module):
    """Multi-period discriminator (discriminator.py:31-66). Input
    waveform (B, L) folded to (B, L/p, p, 1) NHWC."""

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        B, L = x.shape
        p = self.period
        # The reference pads a FULL period when L is already divisible
        # (discriminator.py:50 `period - t % period` is never 0) — keep
        # the quirk for numeric parity.
        pad = p - L % p
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, -1, p, 1)  # (B, L/p, p, C=1)

        fmap = []
        chans = [32, 128, 512, 1024, 1024]
        strides = [(3, 1)] * 4 + [(1, 1)]
        for i, (c, s) in enumerate(zip(chans, strides)):
            x = _wn_conv(c, (5, 1), s, ((2, 2), (0, 0)),
                         name=f"convs_{i}")(x)
            x = _leaky(x)
            fmap.append(x)
        x = _wn_conv(1, (3, 1), (1, 1), ((1, 1), (0, 0)),
                     name="conv_post")(x)
        fmap.append(x)
        return fmap


class MSD(nn.Module):
    """Multi-scale waveform discriminator (discriminator.py:69-99).
    Disabled by the reference adversarial config (rates=[]); the input
    pyramid uses the julius/audiotools-exact windowed-sinc resampler
    (reference resamples via AudioSignal.resample,
    discriminator.py:87-89)."""

    rate: int = 1
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        if self.rate > 1:
            x = resample_julius(x, self.sample_rate,
                                self.sample_rate // self.rate)
        x = x[:, :, None]  # (B, L, C=1) NWC

        fmap = []
        specs = [(16, 15, 1, 7, 1), (64, 41, 4, 20, 4), (256, 41, 4, 20, 16),
                 (1024, 41, 4, 20, 64), (1024, 41, 4, 20, 256),
                 (1024, 5, 1, 2, 1)]
        for i, (c, k, s, p, g) in enumerate(specs):
            x = _wn_conv(c, (k,), (s,), ((p, p),), g,
                         name=f"convs_{i}")(x)
            x = _leaky(x)
            fmap.append(x[:, None])  # lift to (B, 1, W, C) for 4-D losses
        x = _wn_conv(1, (3,), (1,), ((1, 1),), name="conv_post")(x)
        fmap.append(x[:, None])
        return fmap


class MRD(nn.Module):
    """Multi-resolution complex-spectrogram discriminator
    (discriminator.py:105-176). Band-splits the one-sided complex STFT
    along frequency and runs a conv stack per band."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 16000
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)

    def spectrogram(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """(B, L) -> per-band (B, T, F_band, 2) NHWC complex-as-channels."""
        w = self.window_length
        hop = int(w * self.hop_factor)
        fwd, _, _ = _dft_matrices(w, w)
        B, L = x.shape
        T = -(-L // hop)  # ceil: audiotools match_stride frame count
        pad = (w - hop) // 2
        right = T * hop - L
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad + right)),
                     mode="reflect")
        frames = frame_signal(xp, w, hop, T)
        spec = jnp.dot(frames, jnp.asarray(fwd),
                       preferred_element_type=jnp.float32)  # (B, T, 2F)
        F = w // 2 + 1
        spec = spec.reshape(B, T, 2, F).transpose(0, 1, 3, 2)  # (B,T,F,2)
        out = []
        for lo, hi in self.bands:
            out.append(spec[:, :, int(lo * F) : int(hi * F), :])
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x_bands = self.spectrogram(x)
        fmap, outs = [], []
        ch = 32
        specs = [((3, 9), (1, 1), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                 ((3, 9), (1, 2), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                 ((3, 3), (1, 1), (1, 1))]
        for b, band in enumerate(x_bands):
            h = band
            for i, (k, s, p) in enumerate(specs):
                h = _wn_conv(ch, k, s, ((p[0], p[0]), (p[1], p[1])),
                             name=f"band_convs_{b}_{i}")(h)
                h = _leaky(h)
                fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # along frequency
        h = _wn_conv(1, (3, 3), (1, 1), ((1, 1), (1, 1)),
                     name="conv_post")(h)
        fmap.append(h)
        return fmap


class Discriminator(nn.Module):
    """Combined discriminator (discriminator.py:179-221): DC removal +
    peak normalization, then all sub-discriminators."""

    rates: Sequence[int] = ()
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    sample_rate: int = 16000
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)

    def setup(self):
        discs = [MPD(p, name=f"discriminators_{i}")
                 for i, p in enumerate(self.periods)]
        n = len(discs)
        discs += [MSD(r, self.sample_rate, name=f"discriminators_{n + i}")
                  for i, r in enumerate(self.rates)]
        n = len(discs)
        bands = tuple(tuple(b) for b in self.bands)
        discs += [MRD(f, sample_rate=self.sample_rate, bands=bands,
                      name=f"discriminators_{n + i}")
                  for i, f in enumerate(self.fft_sizes)]
        self.discriminators = discs

    def preprocess(self, y: jnp.ndarray) -> jnp.ndarray:
        y = y - jnp.mean(y, axis=-1, keepdims=True)
        peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
        return 0.8 * y / (peak + 1e-9)

    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        x = self.preprocess(x)
        return [d(x) for d in self.discriminators]
