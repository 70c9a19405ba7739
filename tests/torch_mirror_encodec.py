"""Compact PyTorch mirror of EnCodec 24 kHz semantics — TEST FIXTURE.

Reproduces the facebook/encodec model layout (seanet.py, conv.py,
quantization/core_vq.py of the pip package the reference wraps at
baselines/descript/dac/compare/encodec.py) closely enough to emit
release-format state dict keys (``encoder.model.{i}.conv.conv.weight_v``,
``quantizer.vq.layers.{q}._codebook.embed``, ...) and golden outputs for
converter parity tests. Test-only; not part of the package.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


def get_extra_padding(x, k_eff, stride, padding_total):
    length = x.shape[-1]
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(0, ideal - length)


def pad1d(x, left, right, mode="reflect"):
    length = x.shape[-1]
    if mode == "reflect" and max(left, right) >= length:
        extra = max(left, right) - length + 1
        x = F.pad(x, (0, extra))
    return F.pad(x, (left, right), mode=mode)


class NormConv1d(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        self.conv = weight_norm(nn.Conv1d(*a, **k))

    def forward(self, x):
        return self.conv(x)


class NormConvTranspose1d(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        self.convtr = weight_norm(nn.ConvTranspose1d(*a, **k))

    def forward(self, x):
        return self.convtr(x)


class SConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, causal=True,
                 pad_mode="reflect"):
        super().__init__()
        self.conv = NormConv1d(cin, cout, k, stride=stride,
                               dilation=dilation)
        self.k, self.stride, self.dilation = k, stride, dilation
        self.causal, self.pad_mode = causal, pad_mode

    def forward(self, x):
        k_eff = (self.k - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        extra = get_extra_padding(x, k_eff, self.stride, padding_total)
        if self.causal:
            x = pad1d(x, padding_total, extra, self.pad_mode)
        else:
            half = padding_total // 2
            x = pad1d(x, half, padding_total - half + extra,
                      self.pad_mode)
        return self.conv(x)


class SConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, causal=True):
        super().__init__()
        self.convtr = NormConvTranspose1d(cin, cout, k, stride=stride)
        self.k, self.stride, self.causal = k, stride, causal

    def forward(self, x):
        y = self.convtr(x)
        padding_total = self.k - self.stride
        if padding_total > 0:
            if self.causal:
                y = y[..., :-padding_total]
            else:
                left = padding_total // 2
                y = y[..., left:y.shape[-1] - (padding_total - left)]
        return y


class SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2, skip=True):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers)
        self.skip = skip

    def forward(self, x):  # (B, C, T)
        y = x.permute(2, 0, 1)
        y, _ = self.lstm(y)
        y = y.permute(1, 2, 0)
        return y + x if self.skip else y


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, kernel_sizes=(3, 1), dilations=(1, 1),
                 compress=2, causal=True, true_skip=False):
        super().__init__()
        hidden = dim // compress
        dims = [(dim, hidden), (hidden, dim)]
        block = []
        for (cin, cout), k, d in zip(dims, kernel_sizes, dilations):
            block += [nn.ELU(),
                      SConv1d(cin, cout, k, dilation=d, causal=causal)]
        self.block = nn.Sequential(*block)
        self.shortcut = (nn.Identity() if true_skip
                         else SConv1d(dim, dim, 1, causal=causal))

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SEANetEncoder(nn.Module):
    def __init__(self, dimension=128, n_filters=32, ratios=(8, 5, 4, 2),
                 n_residual_layers=1, lstm=2, causal=True):
        super().__init__()
        mult = 1
        layers = [SConv1d(1, mult * n_filters, 7, causal=causal)]
        for ratio in reversed(list(ratios)):
            for j in range(n_residual_layers):
                layers += [SEANetResnetBlock(mult * n_filters,
                                             dilations=(2 ** j, 1),
                                             causal=causal)]
            layers += [nn.ELU(),
                       SConv1d(mult * n_filters, mult * n_filters * 2,
                               2 * ratio, stride=ratio, causal=causal)]
            mult *= 2
        if lstm:
            layers += [SLSTM(mult * n_filters, lstm)]
        layers += [nn.ELU(),
                   SConv1d(mult * n_filters, dimension, 7, causal=causal)]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class SEANetDecoder(nn.Module):
    def __init__(self, dimension=128, n_filters=32, ratios=(8, 5, 4, 2),
                 n_residual_layers=1, lstm=2, causal=True):
        super().__init__()
        mult = 2 ** len(ratios)
        layers = [SConv1d(dimension, mult * n_filters, 7, causal=causal)]
        if lstm:
            layers += [SLSTM(mult * n_filters, lstm)]
        for ratio in ratios:
            layers += [nn.ELU(),
                       SConvTranspose1d(mult * n_filters,
                                        mult * n_filters // 2, 2 * ratio,
                                        stride=ratio, causal=causal)]
            for j in range(n_residual_layers):
                layers += [SEANetResnetBlock(mult * n_filters // 2,
                                             dilations=(2 ** j, 1),
                                             causal=causal)]
            mult //= 2
        layers += [nn.ELU(), SConv1d(n_filters, 1, 7, causal=causal)]
        self.model = nn.Sequential(*layers)

    def forward(self, z):
        return self.model(z)


class _Codebook(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self.register_buffer("embed", torch.randn(bins, dim))

    def quantize(self, x):  # (N, D) -> (N,)
        dist = (x.pow(2).sum(1, keepdim=True)
                - 2 * x @ self.embed.t()
                + self.embed.t().pow(2).sum(0, keepdim=True))
        return dist.argmin(dim=-1)


class _VQLayer(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self._codebook = _Codebook(bins, dim)

    def encode(self, x):  # (B, T, D)
        B, T, D = x.shape
        return self._codebook.quantize(x.reshape(-1, D)).view(B, T)

    def decode(self, codes):
        return self._codebook.embed[codes]


class _VQ(nn.Module):
    def __init__(self, n_q, bins, dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [_VQLayer(bins, dim) for _ in range(n_q)])


class RVQ(nn.Module):
    def __init__(self, n_q=32, bins=1024, dim=128):
        super().__init__()
        self.vq = _VQ(n_q, bins, dim)

    def encode(self, z, n_q):  # z (B, D, T) -> (B, n_q, T)
        residual = z.permute(0, 2, 1)
        out = []
        for layer in self.vq.layers[:n_q]:
            codes = layer.encode(residual)
            residual = residual - layer.decode(codes)
            out.append(codes)
        return torch.stack(out, dim=1)

    def decode(self, codes):  # (B, n_q, T) -> (B, D, T)
        z = sum(self.vq.layers[q].decode(codes[:, q])
                for q in range(codes.shape[1]))
        return z.permute(0, 2, 1)


class EncodecMirror(nn.Module):
    def __init__(self, dimension=128, n_filters=32, ratios=(8, 5, 4, 2),
                 n_q=32, bins=1024, lstm=2):
        super().__init__()
        self.encoder = SEANetEncoder(dimension, n_filters, ratios,
                                     lstm=lstm)
        self.decoder = SEANetDecoder(dimension, n_filters, ratios,
                                     lstm=lstm)
        self.quantizer = RVQ(n_q, bins, dimension)

    @torch.no_grad()
    def encode(self, x, n_q):  # (B, L) -> (B, n_q, T)
        return self.quantizer.encode(self.encoder(x[:, None]), n_q)

    @torch.no_grad()
    def decode(self, codes):  # -> (B, L)
        return self.decoder(self.quantizer.decode(codes))[:, 0]
