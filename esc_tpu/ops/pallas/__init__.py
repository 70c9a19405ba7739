"""Pallas TPU kernels for the codec's hot ops.

Kernels fall back to pure-jnp reference implementations off-TPU (CPU
tests run the fallbacks; numerics are validated against them).
"""

from .vq_kernels import codebook_argmin

__all__ = ["codebook_argmin"]
