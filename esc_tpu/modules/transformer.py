"""Swin-style window attention layers (flax.linen, TPU-native).

Re-design of esc/modules/transformer/attention.py for XLA:

* The SW-MSA attention mask is a pure function of the static token grid
  ``(H, W)`` — the reference rebuilds it on device every forward
  (attention.py:56-75); here it is computed once in numpy at trace time
  and baked into the compiled program as a constant.
* Window partition/reverse are reshapes+transposes (XLA fuses them).
* Cyclic shift is ``jnp.roll`` with static shift.
* The relative-position-bias gather has a static index, so XLA constant-
  folds it into a (num_heads, N, N) bias added inside the attention
  einsum fusion.

Everything is shape-static under jit: ``H, W`` are Python ints carried
alongside the ``(B, H*W, C)`` token tensor exactly like the reference's
``blk_func`` protocol (esc/models/utils.py:3-13).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .scale import PatchMerge, PatchSplit

__all__ = ["TransformerLayer", "SwinBlock", "WindowAttention", "FeedForward",
           "window_partition", "window_reverse", "swin_attention_mask",
           "relative_position_index"]


@functools.lru_cache(maxsize=128)
def swin_attention_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask ``(nW, window², window²)`` of 0 / -100.

    Bit-for-bit the reference's algorithm (attention.py:56-75), evaluated
    once in numpy instead of per-forward on device.
    """
    Hp = -(-H // window) * window
    Wp = -(-W // window) * window
    img = np.zeros((Hp, Wp), dtype=np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    # window partition
    m = img.reshape(Hp // window, window, Wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, N)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=16)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static ``(N, N)`` index into the (2wh-1)(2ww-1) bias table.

    Mirrors attention.py:194-205.
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))            # (2, wh, ww)
    flat = coords.reshape(2, -1)                              # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]                 # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)             # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=256)
def _packed_block_mask(nW: int, N: int, pack: int, H: int, W: int,
                       window: int, shift: int) -> np.ndarray:
    """Static (G, P, P) additive mask for pack-windows-per-tile attention.

    Block (j, j) of group g carries window (g*pack+j)'s SW-MSA mask
    (zeros when unshifted / for dummy pad windows); everything off the
    block diagonal is -1e9, which exp-underflows to exactly 0.0 in the
    softmax — so packing changes only fp summation order, not the math.
    """
    P = pack * N
    if shift > 0:
        win_mask = swin_attention_mask(H, W, window, shift)  # (nW, N, N)
    else:
        win_mask = np.zeros((max(nW, 1), N, N), np.float32)
    nW8 = -(-nW // pack) * pack
    G = nW8 // pack
    pm = np.full((G, P, P), -1e9, np.float32)
    for g in range(G):
        for j in range(pack):
            w = g * pack + j
            blk = win_mask[w] if w < nW else 0.0
            pm[g, j * N:(j + 1) * N, j * N:(j + 1) * N] = blk
    return pm


def packed_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            rel_bias: jnp.ndarray, num_heads: int,
                            scale: float, nW: int, grid_hw: tuple,
                            window: int, shift: int,
                            pack: int = 8) -> jnp.ndarray:
    """Window attention with ``pack`` windows stacked per attention tile.

    The XLA einsum path issues batched (N, N, hd) matmuls with N=16 and
    hd in {6..16} — each one occupies a full 128x128 MXU pass at ~1-2%
    utilization. Stacking 8 windows gives (P=128, P=128, hd) shapes (8x
    fewer passes at 64x more useful rows/cols per pass) at the price of
    8x more score FLOPs — a large net win when attention wall-time is
    pass-bound, which is what tools/layer_breakdown.py measures.

    q/k/v: (B_, N, C) flattened windows (B_ = B * nW). Returns
    (B_, N, C). Exact vs the unpacked path up to fp addition order
    (masked logits are -1e9: exp underflows to exactly 0).
    """
    B_, N, C = q.shape
    nh, hd = num_heads, C // num_heads
    H, W = grid_hw
    B = B_ // nW
    nW8 = -(-nW // pack) * pack
    G = nW8 // pack
    P = pack * N

    def to_groups(t):
        t = t.reshape(B, nW, N, nh, hd)
        if nW8 != nW:
            t = jnp.pad(t, ((0, 0), (0, nW8 - nW), (0, 0), (0, 0), (0, 0)))
        t = t.reshape(B, G, P, nh, hd)
        return t.transpose(0, 1, 3, 2, 4)  # (B, G, nh, P, hd)

    qg, kg, vg = to_groups(q), to_groups(k), to_groups(v)
    scores = jnp.einsum("bghpd,bghqd->bghpq", qg * scale, kg,
                        preferred_element_type=jnp.float32)
    # block-diagonal rel-pos bias: out[h, jN+k, mN+l] = bias[h,k,l]·δjm
    eye = np.eye(pack, dtype=np.float32)
    bias_p = jnp.einsum("hkl,jm->hjkml", rel_bias, eye).reshape(nh, P, P)
    pm = _packed_block_mask(nW, N, pack, H, W, window, shift)
    scores = scores + bias_p[None, None].astype(scores.dtype)
    scores = scores + jnp.asarray(pm)[None, :, None]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bghpq,bghqd->bghpd", attn.astype(q.dtype), vg,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, nW8, N, C)
    if nW8 != nW:
        out = out[:, :nW]
    return out.reshape(B_, N, C)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window, window, C). attention.py:246-250."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)


def window_reverse(windows: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, window, window, C) -> (B, H, W, C). attention.py:252-256."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // window // window)
    x = windows.reshape(B, H // window, W // window, window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class WindowAttention(nn.Module):
    """Multi-head self-attention within a window, with learned relative
    position bias (attention.py:180-244).
    """

    dim: int
    window_size: Sequence[int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[np.ndarray] = None,
                 training: bool = False,
                 packed: Optional[tuple] = None) -> jnp.ndarray:
        """x: (B_, N, C) windows; mask: static (nW, N, N) or None.

        ``packed``: optional static ``(nW, H, W, shift)`` describing the
        window grid; when present and ``ESC_TPU_PACKED_ATTN=1``, the
        pack-8 block-diagonal attention path is used (see
        ``packed_window_attention``).
        """
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = self.qk_scale or hd ** -0.5

        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2., upper=2.),
            ((2 * wh - 1) * (2 * ww - 1), nh))
        idx = relative_position_index(wh, ww)
        rel_bias = table[idx.reshape(-1)].reshape(N, N, nh)
        rel_bias = rel_bias.transpose(2, 0, 1)  # (nh, N, N)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv",
                       dtype=self.dtype)(x)

        # Fused kernel only where the window count is large enough to pay
        # and the head geometry tiles profitably: nh<=12 unrolls in one
        # tile; nh=24/hd=16 uses lane-aligned 8-head channel blocks
        # (2.1-3.7x over XLA on v5e, winning already at 512 windows);
        # nh=24/hd=8 has no lane-aligned grouping and measured ~1.0x, so
        # it keeps XLA (recorded negative result). Narrow-channel stages
        # only pay off at larger window counts (crossover ~1k on v5e).
        from ..ops.pallas.attention_kernels import fused_attention_profitable
        min_windows = 512 if C >= 256 else 2048
        # ESC_TPU_FUSED_ATTN: "0" disables, "1" ignores the window-count
        # threshold (geometry profitability still applies: forcing the
        # nh=24/hd=8 head-padded layout makes XLA scope its ~20MB output
        # to VMEM and the compile OOMs the 16MB scoped limit).
        _env = os.environ.get("ESC_TPU_FUSED_ATTN")
        use_fused = (not training and jax.default_backend() == "tpu"
                     and self.dtype in (jnp.float32, jnp.bfloat16)
                     and _env != "0"
                     and fused_attention_profitable(nh, hd)
                     and (_env == "1" or B_ >= min_windows))
        use_packed = (packed is not None and not use_fused
                      and os.environ.get("ESC_TPU_PACKED_ATTN") == "1")
        if use_fused:
            # fused Pallas path: softmax + both batched matmuls stay in
            # VMEM (esc_tpu/ops/pallas/attention_kernels.py)
            from ..ops.pallas.attention_kernels import fused_window_attention

            q, k, v = jnp.split(qkv, 3, axis=-1)  # (B_, N, C) each
            m = None
            if mask is not None:
                nW = mask.shape[0]
                m = jnp.tile(jnp.asarray(mask), (B_ // nW, 1, 1))
            out = fused_window_attention(q, k, v, rel_bias, m,
                                         num_heads=nh, scale=scale)
        elif use_packed:
            nW, gH, gW, shift = packed
            q, k, v = jnp.split(qkv, 3, axis=-1)  # (B_, N, C) each
            out = packed_window_attention(q, k, v, rel_bias, nh, scale,
                                          nW, (gH, gW), wh, shift)
        else:
            qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, nh, N, hd)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + rel_bias[None].astype(attn.dtype)
            if mask is not None:
                nW = mask.shape[0]
                m = jnp.asarray(mask)[None, :, None]  # (1, nW, 1, N, N)
                attn = attn.reshape(B_ // nW, nW, nh, N, N) + m
                attn = attn.reshape(B_, nh, N, N)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = out.astype(self.dtype)
        return nn.Dense(C, name="proj", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """Linear -> GELU -> Linear MLP (attention.py:258-272)."""

    in_dim: int
    out_dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, name="linear_1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, name="linear_2", dtype=self.dtype)(x)


class SwinBlock(nn.Module):
    """LN -> (shifted-)window MSA -> residual -> LN -> MLP -> residual.

    Mirrors attention.py:93-178: pad-to-window with zeros after norm1,
    cyclic roll for shifted blocks, crop after reversing.
    """

    d_model: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int,
                 training: bool = False) -> jnp.ndarray:
        B, L, C = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x).reshape(B, H, W, C)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        mask = None
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            mask = swin_attention_mask(H, W, ws, ss)

        windows = window_partition(x, ws).reshape(-1, ws * ws, C)
        nW = (Hp // ws) * (Wp // ws)
        attn = WindowAttention(C, (ws, ws), self.num_heads, self.qkv_bias,
                               self.qk_scale, dtype=self.dtype,
                               name="attn")(windows, mask, training,
                                            packed=(nW, H, W, ss))
        attn = attn.reshape(-1, ws, ws, C)
        x = window_reverse(attn, ws, Hp, Wp)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, H * W, C)

        x = shortcut + x
        mlp = FeedForward(C, C, int(C * self.mlp_ratio), dtype=self.dtype,
                          name="mlp")
        return x + mlp(nn.LayerNorm(name="norm2")(x))


class TransformerLayer(nn.Module):
    """``depth`` SwinBlocks (alternating W-MSA / SW-MSA) + optional
    PatchMerge/PatchSplit subsampling (attention.py:9-91).

    Call protocol mirrors ``blk_func``: ``(x, H, W) -> (x', H', W')``.
    """

    in_dim: int
    out_dim: int
    num_heads: int
    depth: int = 2
    window_size: int = 4
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    scale: Optional[str] = None  # None | "down" | "up"
    scale_factor: Sequence[int] = (2, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int,
                 training: bool = False):
        for i in range(self.depth):
            x = SwinBlock(
                d_model=self.in_dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, dtype=self.dtype,
                name=f"swint_blocks_{i}")(x, H, W, training)

        if self.scale == "down":
            x = PatchMerge(self.in_dim, self.out_dim, tuple(self.scale_factor),
                           name="subsample")(x, H)
            s1, s2 = self.scale_factor
            return x, (H + 1) // s1, (W + 1) // s2 if s2 > 1 else W
        if self.scale == "up":
            x = PatchSplit(self.in_dim, self.out_dim, tuple(self.scale_factor),
                           name="subsample")(x, H)
            s1, s2 = self.scale_factor
            return x, H * s1, W * s2
        return x, H, W
