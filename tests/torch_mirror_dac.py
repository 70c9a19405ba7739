"""Compact PyTorch mirror of the reference DAC semantics — TEST FIXTURE.

Mirrors baselines/descript/dac/{model/dac.py, nn/quantize.py,
nn/layers.py} closely enough to generate reference-layout state dicts
and golden outputs for converter parity tests. Test-only.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


class Snake1d(nn.Module):  # layers.py:8-24
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, c, 1))

    def forward(self, x):
        return x + torch.sin(self.alpha * x) ** 2 / (self.alpha + 1e-9)


def WNConv1d(*a, **k):
    return weight_norm(nn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return weight_norm(nn.ConvTranspose1d(*a, **k))


class ResidualUnit(nn.Module):  # dac.py:24-40
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim), WNConv1d(dim, dim, 7, dilation=dilation,
                                   padding=pad),
            Snake1d(dim), WNConv1d(dim, dim, 1))

    def forward(self, x):
        y = self.block(x)
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class EncoderBlock(nn.Module):  # dac.py:43-61
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            ResidualUnit(dim // 2, 1), ResidualUnit(dim // 2, 3),
            ResidualUnit(dim // 2, 9), Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)))

    def forward(self, x):
        return self.block(x)


class Encoder(nn.Module):  # dac.py:64-91
    def __init__(self, d_model, strides, d_latent):
        super().__init__()
        block = [WNConv1d(1, d_model, 7, padding=3)]
        for s in strides:
            d_model *= 2
            block += [EncoderBlock(d_model, s)]
        block += [Snake1d(d_model), WNConv1d(d_model, d_latent, 3,
                                             padding=1)]
        self.block = nn.Sequential(*block)

    def forward(self, x):
        return self.block(x)


class DecoderBlock(nn.Module):  # dac.py:94-112
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(in_dim),
            WNConvTranspose1d(in_dim, out_dim, 2 * stride, stride=stride,
                              padding=math.ceil(stride / 2)),
            ResidualUnit(out_dim, 1), ResidualUnit(out_dim, 3),
            ResidualUnit(out_dim, 9))

    def forward(self, x):
        return self.block(x)


class Decoder(nn.Module):  # dac.py:115-144
    def __init__(self, in_ch, channels, rates):
        super().__init__()
        model = [WNConv1d(in_ch, channels, 7, padding=3)]
        out = channels
        for i, s in enumerate(rates):
            out = channels // 2 ** (i + 1)
            model += [DecoderBlock(channels // 2 ** i, out, s)]
        model += [Snake1d(out), WNConv1d(out, 1, 7, padding=3), nn.Tanh()]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class VectorQuantize(nn.Module):  # quantize.py:13-94
    def __init__(self, input_dim, cb_size, cb_dim):
        super().__init__()
        self.in_proj = WNConv1d(input_dim, cb_dim, 1)
        self.out_proj = WNConv1d(cb_dim, input_dim, 1)
        self.codebook = nn.Embedding(cb_size, cb_dim)

    def decode_latents(self, latents):
        B, D, T = latents.shape
        enc = latents.permute(0, 2, 1).reshape(-1, D)
        cb = self.codebook.weight
        enc = F.normalize(enc)
        cb = F.normalize(cb)
        dist = (enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
                + cb.pow(2).sum(1, keepdim=True).t())
        idx = (-dist).max(1)[1].reshape(B, T)
        zq = F.embedding(idx, self.codebook.weight).transpose(1, 2)
        return zq, idx

    def encode(self, z):
        z_e = self.in_proj(z)
        return self.decode_latents(z_e)


class ResidualVectorQuantize(nn.Module):  # quantize.py:97-255
    def __init__(self, input_dim, n_codebooks, cb_size, cb_dim):
        super().__init__()
        self.quantizers = nn.ModuleList(
            [VectorQuantize(input_dim, cb_size, cb_dim)
             for _ in range(n_codebooks)])

    def encode(self, z, n_q):
        # eval-mode RVQ loop (quantize.py:156-198): the STE is a numeric
        # no-op, so residual -= out_proj(embedding lookup)
        codes, residual = [], z
        for i in range(n_q):
            zq_i, idx = self.quantizers[i].encode(residual)
            codes.append(idx)
            residual = residual - self.quantizers[i].out_proj(zq_i)
        return torch.stack(codes, 1)

    def from_codes(self, codes):
        zq = 0.0
        for i in range(codes.shape[1]):
            zp = F.embedding(codes[:, i],
                             self.quantizers[i].codebook.weight
                             ).transpose(1, 2)
            zq = zq + self.quantizers[i].out_proj(zp)
        return zq


class DACMirror(nn.Module):
    """Reference-equivalent DAC (encode codes / decode from codes)."""

    def __init__(self, encoder_dim, encoder_rates, decoder_dim,
                 decoder_rates, n_codebooks, codebook_size, codebook_dim,
                 sample_rate=16000, quantizer_dropout=0.0):
        super().__init__()
        latent = encoder_dim * 2 ** len(encoder_rates)
        self.hop = 1
        for s in encoder_rates:
            self.hop *= s
        self.encoder = Encoder(encoder_dim, encoder_rates, latent)
        self.quantizer = ResidualVectorQuantize(latent, n_codebooks,
                                                codebook_size, codebook_dim)
        self.decoder = Decoder(latent, decoder_dim, decoder_rates)

    @torch.no_grad()
    def encode(self, x, n_q):
        L = x.shape[-1]
        right = math.ceil(L / self.hop) * self.hop - L
        x = F.pad(x, (0, right))
        z = self.encoder(x[:, None, :])
        return self.quantizer.encode(z, n_q)

    @torch.no_grad()
    def decode_codes(self, codes):
        z = self.quantizer.from_codes(codes)
        return self.decoder(z)[:, 0]
