"""EnCodec building blocks: streamable convs, SLSTM, SEANet residual
units.

From-scratch flax implementation of the architecture described in
"High Fidelity Neural Audio Compression" (Defossez et al., 2022) and
wrapped for comparison by the reference at
baselines/descript/dac/compare/encodec.py. Channels-last ``(B, T, C)``
layout; all padding arithmetic is resolved at trace time from static
shapes, so every call compiles to one XLA program.

The released 24 kHz model is fully causal: convolutions left-pad by
their full receptive deficit (plus a trace-time "extra" right pad that
makes the frame grid cover the whole signal), and transposed convs trim
their full padding from the right.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["SConv1d", "SConvTranspose1d", "SLSTM", "SEANetResnetBlock"]


def _extra_padding(length: int, k_eff: int, stride: int,
                   padding_total: int) -> int:
    """Right padding that makes the conv frame grid cover all samples
    (the torch impl computes this per-forward; here it is static)."""
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(0, ideal - length)


def _pad1d(x: jnp.ndarray, left: int, right: int,
           mode: str = "reflect") -> jnp.ndarray:
    """Pad time axis of (B, T, C). Reflect falls back to replicate-style
    zero extension when the signal is shorter than the pad (tiny-input
    guard, mirroring the torch helper)."""
    if left == 0 and right == 0:
        return x
    T = x.shape[1]
    if mode == "reflect" and max(left, right) >= T:
        extra = max(left, right) - T + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=mode)


class SConv1d(nn.Module):
    """Streamable weight-normalized Conv1d.

    causal=True: all ``padding_total`` on the left (plus static extra on
    the right); causal=False: split symmetrically with the extra going
    right — both exactly the torch semantics the released checkpoints
    were trained with.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = True
    pad_mode: str = "reflect"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        extra = _extra_padding(x.shape[1], k_eff, self.stride,
                               padding_total)
        if self.causal:
            x = _pad1d(x, padding_total, extra, self.pad_mode)
        else:
            half = padding_total // 2
            x = _pad1d(x, half, padding_total - half + extra,
                       self.pad_mode)
        return nn.WeightNorm(nn.Conv(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), kernel_dilation=(self.dilation,),
            padding="VALID", dtype=self.dtype), name="conv")(x)


class SConvTranspose1d(nn.Module):
    """Streamable weight-normalized ConvTranspose1d: full (VALID)
    transposed conv, then trim ``padding_total`` — all from the right
    when causal, else split symmetrically."""

    features: int
    kernel_size: int
    stride: int = 1
    causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.WeightNorm(nn.ConvTranspose(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), padding="VALID", transpose_kernel=True,
            dtype=self.dtype), name="conv")(x)
        padding_total = self.kernel_size - self.stride
        if padding_total > 0:
            if self.causal:
                y = y[:, :-padding_total]
            else:
                left = padding_total // 2
                y = y[:, left:y.shape[1] - (padding_total - left)]
        return y


class _LSTMLayer(nn.Module):
    """One torch-semantics LSTM layer over (T, B, C), via lax.scan.

    Gate order i, f, g, o; two bias vectors — parameter shapes match
    torch's ``weight_ih_l{k}``/``weight_hh_l{k}`` transposed, so
    released weights convert by a single ``.T``.
    """

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        inp = x.shape[-1]
        H = self.hidden
        k = 1.0 / math.sqrt(H)  # torch LSTM: every param ~ U(-k, k)

        def u(key, shape, dtype=jnp.float32):
            import jax
            return jax.random.uniform(key, shape, dtype, -k, k)

        wi = self.param("wi", u, (inp, 4 * H))
        wh = self.param("wh", u, (H, 4 * H))
        bi = self.param("bi", u, (4 * H,))
        bh = self.param("bh", u, (4 * H,))

        B = x.shape[1]
        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)
        xw = jnp.dot(x, wi) + (bi + bh)  # hoist the input GEMM out of scan

        def cell(carry, xw_t):
            h, c = carry
            gates = xw_t + jnp.dot(h, wh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, ys = jax.lax.scan(cell, (h0, c0), xw)
        return ys


class SLSTM(nn.Module):
    """Stacked LSTM with a residual skip (SLSTM in the torch impl)."""

    hidden: int
    num_layers: int = 2
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.swapaxes(x, 0, 1)  # (B,T,C) -> (T,B,C) for scan
        for i in range(self.num_layers):
            y = _LSTMLayer(self.hidden, name=f"lstm_{i}")(y)
        y = jnp.swapaxes(y, 0, 1)
        return y + x if self.skip else y


class SEANetResnetBlock(nn.Module):
    """[ELU -> k3 conv to dim/compress -> ELU -> k1 conv back] + shortcut.

    The released EnCodec checkpoints use a 1x1-conv shortcut
    (``true_skip=False``); set ``true_skip=True`` for an identity skip.
    """

    dim: int
    kernel_sizes: Tuple[int, int] = (3, 1)
    dilations: Tuple[int, int] = (1, 1)
    compress: int = 2
    causal: bool = True
    true_skip: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.compress
        dims: Sequence[int] = (hidden, self.dim)
        y = x
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            y = nn.elu(y)
            y = SConv1d(dims[i], k, dilation=d, causal=self.causal,
                        pad_mode=self.pad_mode, name=f"block_{i}")(y)
        if self.true_skip:
            return x + y
        return SConv1d(self.dim, 1, causal=self.causal,
                       pad_mode=self.pad_mode, name="shortcut")(x) + y
