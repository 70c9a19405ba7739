"""DAC model: snake-conv encoder, residual VQ, transposed-conv decoder,
plus the chunked constant-memory file codec (DACFile).

Re-design of baselines/descript/dac/model/{dac.py,base.py} for flax/TPU,
channels-last. The public wrapper mirrors the reference API:

    dac = DAC(sample_rate=16000, encoder_rates=[2,4,5,8], ...)
    out = dac(x)                       # forward dict
    f = dac.compress("in.wav"); f.save("out.dac")
    y = dac.decompress("out.dac")

Chunked inference runs every conv in VALID mode (the reference's
``padding`` toggle, base.py:57-80) so overlapping windows are seam-free;
delay and output lengths are computed analytically from the static conv
specs instead of module introspection.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Snake1d, WNConv1d, WNConvTranspose1d
from ...utils.host import to_host
from .quantize import ResidualVectorQuantize

__all__ = ["DAC", "DACModule", "DACFile", "loudness_db", "normalize_db"]

SUPPORTED_VERSIONS = ["1.0.0"]


# ----------------------------------------------------------------- audio
def loudness_db(x: np.ndarray, sample_rate: int = 16000,
                block_s: float = 0.4, eps: float = 1e-12) -> float:
    """Gated block RMS loudness in dB.

    Simplified stand-in for audiotools' ITU-R BS.1770 integrated loudness
    (no K-weighting); compress/decompress use the same measure on both
    sides so normalization round-trips exactly.
    """
    x = np.asarray(x, np.float64).reshape(-1)
    n = max(1, int(block_s * sample_rate))
    hop = n // 4 or 1
    if len(x) < n:
        ms = np.mean(x ** 2)
        return float(10 * np.log10(ms + eps))
    blocks = np.lib.stride_tricks.sliding_window_view(x, n)[::hop]
    ms = np.mean(blocks ** 2, axis=1)
    # absolute gate at -70 dB (BS.1770 style)
    keep = ms > 10 ** (-70 / 10)
    ms_kept = ms[keep] if keep.any() else ms
    return float(10 * np.log10(ms_kept.mean() + eps))


def normalize_db(x: np.ndarray, target_db: float,
                 sample_rate: int = 16000) -> np.ndarray:
    """Scale audio so its loudness measures ``target_db``."""
    cur = loudness_db(x, sample_rate)
    return x * (10 ** ((target_db - cur) / 20.0))


# ------------------------------------------------------------------ file
@dataclass
class DACFile:
    """On-disk compressed artifact (base.py:15-54): uint16 codes +
    metadata via np.save, ``.dac`` suffix."""

    codes: np.ndarray
    chunk_length: int
    original_length: int
    input_db: float
    channels: int
    sample_rate: int
    padding: bool
    dac_version: str = SUPPORTED_VERSIONS[-1]

    def save(self, path: str) -> str:
        artifacts = {
            "codes": np.asarray(self.codes).astype(np.uint16),
            "metadata": {
                "input_db": np.float32(self.input_db),
                "original_length": self.original_length,
                "sample_rate": self.sample_rate,
                "chunk_length": self.chunk_length,
                "channels": self.channels,
                "padding": self.padding,
                "dac_version": SUPPORTED_VERSIONS[-1],
            },
        }
        if not str(path).endswith(".dac"):
            path = str(path) + ".dac"
        with open(path, "wb") as f:
            np.save(f, artifacts)  # noqa: allow-pickle on load
        return path

    @classmethod
    def load(cls, path: str) -> "DACFile":
        artifacts = np.load(path, allow_pickle=True)[()]
        meta = dict(artifacts["metadata"])
        if meta.get("dac_version") not in SUPPORTED_VERSIONS:
            raise RuntimeError(
                f"{path} can't be loaded with this codec version")
        meta.pop("dac_version")
        return cls(codes=artifacts["codes"].astype(np.int32),
                   **{k: (float(v) if k == "input_db" else v)
                      for k, v in meta.items()})


# --------------------------------------------------------------- modules
class ResidualUnit(nn.Module):
    """snake -> dilated conv7 -> snake -> conv1, skip cropped to match
    (dac.py:24-40)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="block_0")(x)
        y = WNConv1d(self.dim, 7, dilation=self.dilation, padding=pad,
                     name="block_1")(y, padded)
        y = Snake1d(self.dim, name="block_2")(y)
        y = WNConv1d(self.dim, 1, name="block_3")(y, padded)
        crop = (x.shape[1] - y.shape[1]) // 2
        if crop > 0:
            x = x[:, crop:-crop]
        return x + y


class EncoderBlock(nn.Module):
    """3 dilated residual units + strided downsampling conv
    (dac.py:43-61)."""

    dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.dim // 2, d, name=f"block_{i}")(x, padded)
        x = Snake1d(self.dim // 2, name="block_3")(x)
        return WNConv1d(self.dim, 2 * self.stride, stride=self.stride,
                        padding=math.ceil(self.stride / 2),
                        name="block_4")(x, padded)


class Encoder(nn.Module):
    """(B, T, 1) -> (B, T/hop, latent) (dac.py:64-91)."""

    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        x = WNConv1d(self.d_model, 7, padding=3, name="block_0")(x, padded)
        d = self.d_model
        for i, s in enumerate(self.strides):
            d *= 2
            x = EncoderBlock(d, s, name=f"block_{i + 1}")(x, padded)
        x = Snake1d(d, name=f"block_{len(self.strides) + 1}")(x)
        return WNConv1d(self.d_latent, 3, padding=1,
                        name=f"block_{len(self.strides) + 2}")(x, padded)


class DecoderBlock(nn.Module):
    """snake -> strided transposed conv -> 3 residual units
    (dac.py:94-112)."""

    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        x = Snake1d(self.input_dim, name="block_0")(x)
        x = WNConvTranspose1d(self.output_dim, 2 * self.stride,
                              stride=self.stride,
                              padding=math.ceil(self.stride / 2),
                              name="block_1")(x, padded)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.output_dim, d,
                             name=f"block_{i + 2}")(x, padded)
        return x


class Decoder(nn.Module):
    """(B, T/hop, latent) -> (B, T, 1) in [-1, 1] (dac.py:115-144)."""

    input_channel: int
    channels: int
    rates: Sequence[int]
    d_out: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        x = WNConv1d(self.channels, 7, padding=3, name="model_0")(x, padded)
        out_dim = self.channels
        for i, s in enumerate(self.rates):
            in_dim = self.channels // 2 ** i
            out_dim = self.channels // 2 ** (i + 1)
            x = DecoderBlock(in_dim, out_dim, s,
                             name=f"model_{i + 1}")(x, padded)
        x = Snake1d(out_dim, name=f"model_{len(self.rates) + 1}")(x)
        x = WNConv1d(self.d_out, 7, padding=3,
                     name=f"model_{len(self.rates) + 2}")(x, padded)
        return jnp.tanh(x)


class DACModule(nn.Module):
    """Full codec as one flax module (dac.py:147-322)."""

    encoder_dim: int = 64
    encoder_rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    sample_rate: int = 44100

    @property
    def _latent(self) -> int:
        return (self.latent_dim if self.latent_dim is not None
                else self.encoder_dim * (2 ** len(self.encoder_rates)))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    def setup(self):
        self.encoder = Encoder(self.encoder_dim, tuple(self.encoder_rates),
                               self._latent)
        self.quantizer = ResidualVectorQuantize(
            input_dim=self._latent, n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size, codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout)
        self.decoder = Decoder(self._latent, self.decoder_dim,
                               tuple(self.decoder_rates))

    def encode(self, audio: jnp.ndarray, n_quantizers=None,
               training: bool = False, padded: bool = True):
        """audio (B, T) -> (z_q, codes, latents, commitment, codebook)."""
        z = self.encoder(audio[..., None], padded)
        return self.quantizer(z, n_quantizers, training=training)

    def decode(self, z: jnp.ndarray, padded: bool = True) -> jnp.ndarray:
        """latent (B, T', D) -> audio (B, T)."""
        return self.decoder(z, padded)[..., 0]

    def decode_codes(self, codes: jnp.ndarray,
                     padded: bool = True) -> jnp.ndarray:
        z_q, _, _ = self.quantizer.from_codes(codes)
        return self.decode(z_q, padded)

    def __call__(self, audio: jnp.ndarray, n_quantizers=None,
                 training: bool = False):
        """Padded full forward (dac.py:268-322). Returns the reference
        output dict (audio cropped back to the input length)."""
        length = audio.shape[-1]
        right = -(-length // self.hop_length) * self.hop_length - length
        x = jnp.pad(audio, ((0, 0), (0, right)))
        z, codes, latents, cm, cb = self.encode(x, n_quantizers,
                                                training=training)
        recon = self.decode(z)[..., :length]
        return {"audio": recon, "z": z, "codes": codes, "latents": latents,
                "vq/commitment_loss": cm, "vq/codebook_loss": cb}


def _conv_specs(m: DACModule) -> List[Tuple[str, int, int, int]]:
    """Ordered (kind, k, s, d) conv specs of the full model, encoder then
    decoder — drives the analytic delay/output-length math
    (base.py:82-123)."""
    specs: List[Tuple[str, int, int, int]] = [("c", 7, 1, 1)]
    for s in m.encoder_rates:
        for d in (1, 3, 9):
            specs += [("c", 7, 1, d), ("c", 1, 1, 1)]
        specs += [("c", 2 * s, s, 1)]
    specs += [("c", 3, 1, 1)]
    specs += [("c", 7, 1, 1)]
    for s in m.decoder_rates:
        specs += [("t", 2 * s, s, 1)]
        for d in (1, 3, 9):
            specs += [("c", 7, 1, d), ("c", 1, 1, 1)]
    specs += [("c", 7, 1, 1)]
    return specs


@functools.partial(jax.jit, static_argnames=("mod",))
def _dac_init_jit(mod, rng, x):
    return mod.init(rng, x, None, False)


class DAC:
    """Stateful wrapper: owns params + jit caches + the file codec."""

    def __init__(self, seed: int = 0, **config):
        # YAML configs give lists; tuples keep the module hashable so it
        # can key shared jit caches across wrapper instances.
        config = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in config.items()}
        self.module = DACModule(**config)
        self.config = config
        self.variables = None
        self._seed = seed
        self.sample_rate = self.module.sample_rate
        self.hop_length = self.module.hop_length
        self.delay = self.get_delay()

        mod = self.module
        self._encode_codes = jax.jit(
            lambda v, x, padded: mod.apply(v, x, None, False, padded,
                                           method="encode")[1],
            static_argnames=("padded",))
        self._decode_codes = jax.jit(
            lambda v, c, padded: mod.apply(v, c, padded,
                                           method="decode_codes"),
            static_argnames=("padded",))
        self._forward = jax.jit(
            lambda v, x: mod.apply(v, x, None, False))

    # -- variables -----------------------------------------------------
    def init_params(self, seed: Optional[int] = None,
                    example_len: int = 16000):
        rng = jax.random.PRNGKey(self._seed if seed is None else seed)
        L = -(-example_len // self.hop_length) * self.hop_length
        x = jnp.zeros((1, L), jnp.float32)
        # shared across instances with equal configs (frozen module is
        # the jit cache key) — one init compile per (config, length)
        self.variables = _dac_init_jit(self.module, rng, x)
        return self.variables

    def _ensure_init(self):
        if self.variables is None:
            self.init_params()

    def num_params(self) -> int:
        self._ensure_init()
        return int(sum(np.prod(l.shape) for l in
                       jax.tree_util.tree_leaves(self.variables["params"])))

    # -- analytic geometry ----------------------------------------------
    def get_output_length(self, input_length: int) -> int:
        """VALID-mode output length through the whole model
        (base.py:108-123)."""
        L = input_length
        for kind, k, s, d in _conv_specs(self.module):
            if kind == "c":
                L = (L - d * (k - 1) - 1) // s + 1
            else:
                L = (L - 1) * s + d * (k - 1) + 1
        return L

    def get_delay(self) -> int:
        """Seam delay for chunked VALID-mode inference (base.py:82-106)."""
        L = l_out = self.get_output_length(0)
        for kind, k, s, d in reversed(_conv_specs(self.module)):
            if kind == "t":
                L = math.ceil((L - d * (k - 1) - 1) / s) + 1
            else:
                L = math.ceil((L - 1) * s + d * (k - 1) + 1)
        return (L - l_out) // 2

    # -- API -------------------------------------------------------------
    def __call__(self, audio, n_quantizers=None):
        self._ensure_init()
        x = jnp.asarray(audio, jnp.float32)
        if x.ndim == 3:  # reference (B, 1, T)
            x = x[:, 0]
        if n_quantizers is None:
            return self._forward(self.variables, x)
        return self.module.apply(self.variables, x, int(n_quantizers),
                                 False)

    forward = __call__

    def compress(self, audio_or_path, win_duration: float = 1.0,
                 normalize_db_target: Optional[float] = -16,
                 n_quantizers: Optional[int] = None,
                 verbose: bool = False) -> DACFile:
        """Windowed constant-memory compression (base.py:125-233)."""
        self._ensure_init()
        if isinstance(audio_or_path, (str,)):
            from ...train.data import load_wav
            x = load_wav(audio_or_path)
        else:
            x = np.asarray(audio_or_path, np.float32).reshape(-1)
        original_length = len(x)
        input_db = loudness_db(x, self.sample_rate)
        if normalize_db_target is not None:
            x = normalize_db(x, normalize_db_target, self.sample_rate)
        peak = np.abs(x).max()
        if peak > 1.0:
            x = x / peak

        duration = len(x) / self.sample_rate
        if duration <= win_duration:
            padded = True
            right = -(-len(x) // self.hop_length) * self.hop_length - len(x)
            x = np.pad(x, (0, right))
            n_samples = len(x)
            hop = len(x)
        else:
            padded = False
            x = np.pad(x, (self.delay, self.delay))
            n_samples = int(win_duration * self.sample_rate)
            n_samples = -(-n_samples // self.hop_length) * self.hop_length
            hop = self.get_output_length(n_samples)

        codes = []
        chunk_length = None
        for i in range(0, original_length if not padded else 1, hop):
            chunk = x[i : i + n_samples]
            if len(chunk) < n_samples:
                chunk = np.pad(chunk, (0, n_samples - len(chunk)))
            c = to_host(self._encode_codes(
                self.variables, jnp.asarray(chunk[None]), padded))
            if n_quantizers is not None:
                c = c[:, :n_quantizers]
            codes.append(c)
            chunk_length = c.shape[-1]
        codes = np.concatenate(codes, axis=-1)
        return DACFile(codes=codes, chunk_length=chunk_length,
                       original_length=original_length, input_db=input_db,
                       channels=1, sample_rate=self.sample_rate,
                       padding=padded)

    def decompress(self, obj: Union[str, DACFile],
                   verbose: bool = False) -> np.ndarray:
        """Reconstruct audio from a .dac file (base.py:235-294)."""
        self._ensure_init()
        if isinstance(obj, str):
            obj = DACFile.load(obj)
        codes = np.asarray(obj.codes, np.int32)
        recons = []
        cl = obj.chunk_length
        for i in range(0, codes.shape[-1], cl):
            c = jnp.asarray(codes[..., i : i + cl])
            r = to_host(self._decode_codes(self.variables, c,
                                              obj.padding))
            recons.append(r)
        y = np.concatenate(recons, axis=-1).reshape(-1)
        y = normalize_db(y, obj.input_db, self.sample_rate)
        if len(y) < obj.original_length:
            # padded-mode decoding can come up a few samples short when a
            # rate's transposed conv drops one latent step (e.g. rate 5);
            # zero-fill the tail (the torch reference would error here).
            y = np.pad(y, (0, obj.original_length - len(y)))
        return y[: obj.original_length][None]
