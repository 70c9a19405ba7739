"""esc_tpu — a TPU-native (JAX/XLA/Pallas) neural speech codec framework.

A from-scratch re-design of the capabilities of
yzGuu830/efficient-speech-codec (EMNLP 2024, arXiv:2404.19441) for TPU:
complex-STFT frontend as framing+GEMM, Swin window-attention
encoder/decoder with static precomputed masks, cross-scale residual
product vector quantization with MXU-tiled nearest-neighbor search, and
SPMD data-parallel training over a jax.sharding Mesh.
"""

__version__ = "0.1.0"
