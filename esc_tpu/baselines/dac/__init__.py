"""TPU-native DAC (Descript Audio Codec) baseline.

Re-design of the reference's vendored baselines/descript/dac for
JAX/flax: snake-activation 1-D conv encoder, factorized-codebook
residual VQ with per-sample quantizer dropout, mirrored transposed-conv
decoder, chunked constant-memory compress/decompress with the DACFile
on-disk format, and DNS-style trainers.
"""

from .model import DAC, DACFile
from .quantize import ResidualVectorQuantize, VectorQuantize

__all__ = ["DAC", "DACFile", "ResidualVectorQuantize", "VectorQuantize"]
