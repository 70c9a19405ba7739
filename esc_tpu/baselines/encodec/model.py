"""EnCodec 24 kHz codec, tpu-native.

From-scratch flax re-implementation of the model the reference wraps
for benchmark comparisons (baselines/descript/dac/compare/encodec.py —
the torch wrapper loads Facebook's ``encodec`` pip package; that package
and its weights are unavailable offline, so esc_tpu carries the real
architecture instead of a gated stub).

Architecture (Defossez et al. 2022, 24 kHz causal model):
  encoder: conv k7 (1->32) -> 4x [resnet block, ELU, down-conv k2r/sr]
           with r in (2,4,5,8), channels doubling to 512
           -> SLSTM(512, 2 layers) -> ELU -> conv k7 (512->128)
  quantizer: plain RVQ, 32 codebooks x 1024 entries, dim 128
             (75 frames/s -> 750 bps per codebook)
  decoder: exact mirror with transposed convs, ratios (8,5,4,2).

The wrapper class keeps the reference comparison interface:
``Encodec(bandwidth=6.0)(audio, sample_rate) -> recon`` — resampling
to/from 24 kHz included (ops/resample.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import SConv1d, SConvTranspose1d, SEANetResnetBlock, SLSTM
from .quantize import EncodecRVQ
from ...utils.host import to_host

__all__ = ["SEANetEncoder", "SEANetDecoder", "EncodecModule", "Encodec"]


class SEANetEncoder(nn.Module):
    dimension: int = 128
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm: int = 2
    causal: bool = True
    true_skip: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) waveform -> (B, T/hop, dimension) latents."""
        mult = 1
        n = 0  # sequential index, mirrors the torch nn.Sequential keys
        y = SConv1d(mult * self.n_filters, self.kernel_size,
                    causal=self.causal, pad_mode=self.pad_mode,
                    name=f"layer_{n}")(x)
        n += 1
        for ratio in reversed(self.ratios):
            for j in range(self.n_residual_layers):
                y = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    compress=self.compress, causal=self.causal,
                    true_skip=self.true_skip, pad_mode=self.pad_mode,
                    name=f"layer_{n}")(y)
                n += 1
            y = nn.elu(y)
            n += 1  # the ELU occupies a sequential slot in torch
            y = SConv1d(mult * self.n_filters * 2, 2 * ratio, stride=ratio,
                        causal=self.causal, pad_mode=self.pad_mode,
                        name=f"layer_{n}")(y)
            n += 1
            mult *= 2
        if self.lstm:
            y = SLSTM(mult * self.n_filters, self.lstm,
                      name=f"layer_{n}")(y)
            n += 1
        y = nn.elu(y)
        n += 1
        return SConv1d(self.dimension, self.last_kernel_size,
                       causal=self.causal, pad_mode=self.pad_mode,
                       name=f"layer_{n}")(y)


class SEANetDecoder(nn.Module):
    dimension: int = 128
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm: int = 2
    causal: bool = True
    true_skip: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T, dimension) latents -> (B, T*hop, 1) waveform."""
        mult = 2 ** len(self.ratios)
        n = 0
        y = SConv1d(mult * self.n_filters, self.kernel_size,
                    causal=self.causal, pad_mode=self.pad_mode,
                    name=f"layer_{n}")(z)
        n += 1
        if self.lstm:
            y = SLSTM(mult * self.n_filters, self.lstm,
                      name=f"layer_{n}")(y)
            n += 1
        for ratio in self.ratios:
            y = nn.elu(y)
            n += 1
            y = SConvTranspose1d(mult * self.n_filters // 2, 2 * ratio,
                                 stride=ratio, causal=self.causal,
                                 name=f"layer_{n}")(y)
            n += 1
            for j in range(self.n_residual_layers):
                y = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    compress=self.compress, causal=self.causal,
                    true_skip=self.true_skip, pad_mode=self.pad_mode,
                    name=f"layer_{n}")(y)
                n += 1
            mult //= 2
        y = nn.elu(y)
        n += 1
        return SConv1d(1, self.last_kernel_size, causal=self.causal,
                       pad_mode=self.pad_mode, name=f"layer_{n}")(y)


class EncodecModule(nn.Module):
    """Full codec: encoder -> RVQ -> decoder, (B, L) mono waveforms."""

    sample_rate: int = 24000
    dimension: int = 128
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_q: int = 32
    bins: int = 1024

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    def setup(self):
        self.encoder = SEANetEncoder(dimension=self.dimension,
                                     n_filters=self.n_filters,
                                     ratios=self.ratios)
        self.decoder = SEANetDecoder(dimension=self.dimension,
                                     n_filters=self.n_filters,
                                     ratios=self.ratios)
        self.quantizer = EncodecRVQ(n_q=self.n_q, bins=self.bins,
                                    dim=self.dimension)

    def encode(self, x: jnp.ndarray, n_q: Optional[int] = None):
        """(B, L) -> codes (B, n_q, T)."""
        z = self.encoder(x[..., None])
        return self.quantizer.encode(z, n_q)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, n_q, T) -> (B, T*hop) waveform."""
        z = self.quantizer.decode(codes)
        return self.decoder(z)[..., 0]

    def __call__(self, x: jnp.ndarray, n_q: Optional[int] = None,
                 training: bool = False):
        z = self.encoder(x[..., None])
        zq, codes, commit = self.quantizer(z, n_q, training)
        recon = self.decoder(zq)[..., 0]
        return {"audio": recon[:, : x.shape[-1]], "codes": codes,
                "vq/commitment_loss": commit}


@functools.partial(jax.jit, static_argnames=("mod",))
def _encodec_init_jit(mod, rng, x):
    return mod.init(rng, x, None, False)


@functools.partial(jax.jit, static_argnames=("mod", "n_q"))
def _encodec_encode_jit(mod, variables, x, n_q):
    return mod.apply(variables, x, n_q, method="encode")


@functools.partial(jax.jit, static_argnames=("mod",))
def _encodec_decode_jit(mod, variables, codes):
    return mod.apply(variables, codes, method="decode")


class Encodec:
    """Comparison wrapper with the reference interface
    (dac/compare/encodec.py): pick a target bandwidth, feed audio at any
    sample rate, get the reconstruction back at that rate."""

    def __init__(self, sample_rate: int = 24000, bandwidth: float = 6.0,
                 seed: int = 0, **config):
        if sample_rate != 24000:
            raise ValueError(
                "only the 24 kHz EnCodec architecture is implemented "
                "(the reference comparison also uses the 24 kHz model)")
        config = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in config.items()}
        self.module = EncodecModule(sample_rate=sample_rate, **config)
        self.sample_rate = sample_rate
        self.variables = None
        self._seed = seed
        self.set_target_bandwidth(bandwidth)

    # -- bandwidth ------------------------------------------------------
    @property
    def bits_per_codebook(self) -> float:
        return math.log2(self.module.bins)

    def set_target_bandwidth(self, bandwidth: float):
        """kbps -> number of RVQ codebooks (75 Hz x 10 bit = 750 bps/cb)."""
        per_cb = self.module.frame_rate * self.bits_per_codebook
        n_q = int(max(1, math.floor(bandwidth * 1000.0 / per_cb)))
        if n_q > self.module.n_q:
            raise ValueError(f"bandwidth {bandwidth} kbps needs {n_q} "
                             f"codebooks; model has {self.module.n_q}")
        self.bandwidth = bandwidth
        self.n_q = n_q

    # -- params ---------------------------------------------------------
    def init_params(self, seed: Optional[int] = None,
                    example_len: int = 24000):
        rng = jax.random.PRNGKey(self._seed if seed is None else seed)
        x = jnp.zeros((1, example_len), jnp.float32)
        self.variables = _encodec_init_jit(self.module, rng, x)
        return self.variables

    def _ensure_init(self):
        if self.variables is None:
            self.init_params()

    def load_torch_weights(self, path: str):
        """Load a released ``encodec_24khz`` torch state dict (see
        convert.py in this package)."""
        from .convert import load_torch_encodec
        self._ensure_init()
        self.variables = load_torch_encodec(path, self.module,
                                            self.variables)
        return self.variables

    # -- codec API ------------------------------------------------------
    def encode(self, audio: np.ndarray) -> np.ndarray:
        """24 kHz (B, L) -> codes (B, n_q, T) at the target bandwidth."""
        self._ensure_init()
        x = jnp.asarray(audio, jnp.float32)
        return to_host(
            _encodec_encode_jit(self.module, self.variables, x, self.n_q))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        self._ensure_init()
        return to_host(_encodec_decode_jit(
            self.module, self.variables, jnp.asarray(codes)))

    def __call__(self, audio: np.ndarray,
                 sample_rate: int = 24000) -> np.ndarray:
        """Roundtrip at the target bandwidth; resamples in and out."""
        from esc_tpu.ops.resample import resample

        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None]
        L = x.shape[-1]
        if sample_rate != self.sample_rate:
            x = np.asarray(resample(x, sample_rate, self.sample_rate))
        recon = self.decode(self.encode(x))[:, : x.shape[-1]]
        if sample_rate != self.sample_rate:
            recon = np.asarray(resample(recon, self.sample_rate,
                                        sample_rate))
        return recon[:, :L]
