"""Compact PyTorch mirror of the reference ESC semantics — TEST FIXTURE.

The real reference (/root/reference) cannot be imported in this image
(torchaudio/timm are absent), so golden-value parity tests build this
minimal torch implementation of the same math (cited per class below),
generate a state_dict with the reference's key layout, convert it with
esc_tpu.convert.torch_to_flax, and require bit-exact codes / tolerance-
level waveforms from the JAX model.

Only the transformer backbone + product-VQ path (the ESC flagship) is
mirrored; shapes/semantics follow esc/models/* and esc/modules/* as
cited. This file is test-only and is NOT part of the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- signal
def stft(x, in_freq=192):
    """torchaudio Spectrogram(power=None) equivalent (base.py:22-37)."""
    n_fft = (in_freq - 1) * 2
    w = torch.hann_window(320, dtype=torch.float32)
    s = torch.stft(x, n_fft=n_fft, hop_length=80, win_length=320, window=w,
                   center=True, pad_mode="reflect", return_complex=True)
    return torch.view_as_real(s).permute(0, 3, 1, 2).contiguous()


def istft(feat, in_freq=192):
    """InverseSpectrogram equivalent (base.py:39-47)."""
    n_fft = (in_freq - 1) * 2
    w = torch.hann_window(320, dtype=torch.float32)
    cplx = torch.view_as_complex(
        feat.permute(0, 2, 3, 1).contiguous())
    return torch.istft(cplx, n_fft=n_fft, hop_length=80, win_length=320,
                       window=w, center=True)


# ------------------------------------------------------------- scale ops
def px_unshuffle(x, s1=2, s2=1):
    B, H, W, C = x.shape
    return x.reshape(B, H // s1, s1, W // s2, s2, C).permute(
        0, 1, 3, 2, 4, 5).reshape(B, H // s1, W // s2, C * s1 * s2)


def px_shuffle(x, s1=2, s2=1):
    B, H, W, C = x.shape
    return x.reshape(B, H, W, s1, s2, C // (s1 * s2)).permute(
        0, 1, 3, 2, 4, 5).reshape(B, H * s1, W * s2, C // (s1 * s2))


class PatchEmbed(nn.Module):  # scale.py:26-50
    def __init__(self, freq, in_chans, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, dim, patch, patch)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.proj(x)
        B, C, H, W = x.shape
        return self.norm(x.flatten(2).transpose(1, 2))


class PatchDeEmbed(nn.Module):  # scale.py:52-81
    def __init__(self, freq, in_chans, patch, dim):
        super().__init__()
        self.patch = patch
        self.H = freq // patch[0]
        self.de_proj1 = nn.Conv2d(dim, dim * patch[0] * patch[1], 5, 1, 2)
        self.de_proj2 = nn.Conv2d(dim, in_chans, 3, 1, 1)

    def forward(self, x):
        B, L, C = x.shape
        x = x.transpose(1, 2).reshape(B, C, self.H, L // self.H)
        x = self.de_proj1(x)
        x = px_shuffle(x.permute(0, 2, 3, 1), *self.patch)
        return self.de_proj2(x.permute(0, 3, 1, 2))


class PatchMerge(nn.Module):  # scale.py:83-115
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm = nn.LayerNorm(2 * in_dim)
        self.down = nn.Linear(2 * in_dim, out_dim, bias=False)

    def forward(self, x, H):
        B, L, C = x.shape
        x = x.reshape(B, H, L // H, C)
        if H % 2:
            x = F.pad(x, (0, 0, 0, 0, 0, 1))
        x = px_unshuffle(x, 2, 1).reshape(B, -1, 2 * C)
        return self.down(self.norm(x))


class PatchSplit(nn.Module):  # scale.py:117-145
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm = nn.LayerNorm(in_dim)
        self.up = nn.Linear(in_dim, out_dim * 2, bias=False)

    def forward(self, x, H):
        x = self.up(self.norm(x))
        B, L, C = x.shape
        x = x.reshape(B, H, L // H, C)
        return px_shuffle(x, 2, 1).reshape(B, -1, C // 2)


# ------------------------------------------------------------- attention
def win_part(x, ws):  # attention.py:246-250
    B, H, W, C = x.shape
    return x.reshape(B, H // ws, ws, W // ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def win_rev(w, ws, H, W):  # attention.py:252-256
    B = w.shape[0] // (H * W // ws // ws)
    return w.reshape(B, H // ws, W // ws, ws, ws, -1).permute(
        0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):  # attention.py:180-244
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.ws, self.heads = ws, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        c = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                       indexing="ij")).flatten(1)
        rel = (c[:, :, None] - c[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)].reshape(N, N, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.heads, N, N) \
                + mask[None, :, None]
            attn = attn.reshape(-1, self.heads, N, N)
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class FeedForward(nn.Module):  # attention.py:258-272
    def __init__(self, dim, hidden):
        super().__init__()
        self.linear_1 = nn.Linear(dim, hidden)
        self.linear_2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.linear_2(F.gelu(self.linear_1(x)))


class SwinBlock(nn.Module):  # attention.py:93-178
    def __init__(self, dim, heads, ws, shift, mlp_ratio):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = FeedForward(dim, int(dim * mlp_ratio))

    def forward(self, x, H, W, mask):
        B, L, C = x.shape
        short = x
        x = self.norm1(x).reshape(B, H, W, C)
        pr = (self.ws - W % self.ws) % self.ws
        pb = (self.ws - H % self.ws) % self.ws
        x = F.pad(x, (0, 0, 0, pr, 0, pb))
        Hp, Wp = H + pb, W + pr
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
        w = win_part(x, self.ws).reshape(-1, self.ws * self.ws, C)
        w = self.attn(w, mask if self.shift else None)
        x = win_rev(w.reshape(-1, self.ws, self.ws, C), self.ws, Hp, Wp)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = short + x
        return x + self.mlp(self.norm2(x))


class TransformerLayer(nn.Module):  # attention.py:9-91
    def __init__(self, in_dim, out_dim, heads, depth, ws, mlp_ratio, scale):
        super().__init__()
        self.ws = ws
        self.shift = ws // 2
        self.swint_blocks = nn.ModuleList([
            SwinBlock(in_dim, heads, ws, 0 if i % 2 == 0 else ws // 2,
                      mlp_ratio) for i in range(depth)])
        self.subsample = (PatchMerge(in_dim, out_dim) if scale == "down"
                          else PatchSplit(in_dim, out_dim) if scale == "up"
                          else None)
        self.scale = scale

    def _mask(self, H, W, dev):
        ws, ss = self.ws, self.shift
        Hp = math.ceil(H / ws) * ws
        Wp = math.ceil(W / ws) * ws
        img = torch.zeros(1, Hp, Wp, 1, device=dev)
        sl = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        cnt = 0
        for h in sl:
            for w in sl:
                img[:, h, w] = cnt
                cnt += 1
        mw = win_part(img, ws).reshape(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        return am.masked_fill(am != 0, -100.0)

    def forward(self, x, H, W):
        mask = self._mask(H, W, x.device)
        for blk in self.swint_blocks:
            x = blk(x, H, W, mask)
        if self.scale == "down":
            return self.subsample(x, H), (H + 1) // 2, W
        if self.scale == "up":
            return self.subsample(x, H), H * 2, W
        return x, H, W


# ------------------------------------------------------------------- VQ
class Codebook(nn.Module):  # codebook.py:5-83
    def __init__(self, dim, num, l2norm):
        super().__init__()
        self.embedding = nn.Embedding(num, dim)
        nn.init.kaiming_normal_(self.embedding.weight)
        self.l2norm = l2norm

    def encode(self, z):
        cb = self.embedding.weight
        zf = z.reshape(-1, z.shape[-1])
        if self.l2norm:
            cb = F.normalize(cb, dim=-1)
            zf = F.normalize(zf, dim=-1)
        d = (zf.pow(2).sum(1, keepdim=True) - 2 * zf @ cb.t()
             + cb.pow(2).sum(1, keepdim=True).t())
        return d.min(1).indices.reshape(z.shape[0], -1)

    def decode(self, code):
        return F.embedding(code, self.embedding.weight)


class ProductVQ(nn.Module):  # quantization.py:7-136
    def __init__(self, in_dim, in_freq, overlap, num_vqs, cb_dim, cb_size,
                 l2norm):
        super().__init__()
        self.in_freq, self.overlap = in_freq, overlap
        self.fix_dim = in_freq * in_dim
        total = self.fix_dim * overlap
        if total % num_vqs == 0:  # quantization.py:380-386
            self.dims = [total // num_vqs] * num_vqs
        else:
            self.dims = [total // num_vqs] * (num_vqs - 1)
            self.dims.append(total - sum(self.dims))
        self.vqs = nn.ModuleList(
            [Codebook(cb_dim, cb_size, l2norm) for _ in self.dims])
        self.down_projs = nn.ModuleList(
            [nn.Linear(d, cb_dim, bias=False) for d in self.dims])
        self.up_projs = nn.ModuleList(
            [nn.Linear(cb_dim, d, bias=False) for d in self.dims])

    def _pre(self, z):  # quantization.py:388-410
        B, L, C = z.shape
        H = self.in_freq
        z = z.reshape(B, H, L // H, C).permute(0, 2, 3, 1).reshape(
            B, L // H, self.fix_dim)
        if self.overlap > 1:
            z = z.reshape(B, -1, self.overlap * self.fix_dim)
        return z

    def _post(self, z):  # quantization.py:412-432
        B = z.shape[0]
        if self.overlap > 1:
            z = z.reshape(B, -1, self.fix_dim)
        W = z.shape[1]
        H = self.in_freq
        z = z.reshape(B, W, -1, H).permute(0, 3, 1, 2)
        return z.reshape(B, H * W, -1)

    def encode(self, z):
        z = self._pre(z)
        codes, s = [], 0
        for m, (dp, vq) in enumerate(zip(self.down_projs, self.vqs)):
            codes.append(vq.encode(dp(z[..., s:s + self.dims[m]])))
            s += self.dims[m]
        return torch.stack(codes, 1)

    def decode(self, codes):
        zq = [up(vq.decode(codes[:, m]))
              for m, (up, vq) in enumerate(zip(self.up_projs, self.vqs))]
        return self._post(torch.cat(zq, -1))


# ---------------------------------------------------------------- codec
class Encoder(nn.Module):  # base.py:110-158
    def __init__(self, cfg):
        super().__init__()
        h = cfg["h_dims"]
        self.patch_embed = PatchEmbed(cfg["in_freq"], cfg["in_dim"],
                                      tuple(cfg["patch_size"]), h[0])
        self.pre_nn = TransformerLayer(h[0], h[0], cfg["swin_heads"][0],
                                       cfg["swin_depth"], cfg["window_size"],
                                       cfg["mlp_ratio"], None)
        self.blocks = nn.ModuleList([
            TransformerLayer(h[i], h[i + 1], cfg["swin_heads"][i],
                             cfg["swin_depth"], cfg["window_size"],
                             cfg["mlp_ratio"], "down")
            for i in range(len(h) - 1)])
        self.patch = cfg["patch_size"]

    def forward(self, feat):
        H, W = feat.shape[2] // self.patch[0], feat.shape[3] // self.patch[1]
        x = self.patch_embed(feat)
        x, H, W = self.pre_nn(x, H, W)
        hs = [x]
        for blk in self.blocks:
            x, H, W = blk(x, H, W)
            hs.append(x)
        return hs, (H, W)


class CSRVQDecoder(nn.Module):  # csrvq.py:63-183
    def __init__(self, cfg):
        super().__init__()
        h = cfg["h_dims"][::-1]
        heads = cfg["swin_heads"][::-1]
        self.blocks = nn.ModuleList([
            TransformerLayer(h[i], h[i + 1], heads[i], cfg["swin_depth"],
                             cfg["window_size"], cfg["mlp_ratio"], "up")
            for i in range(len(h) - 1)])
        self.post_nn = TransformerLayer(h[-1], h[-1], heads[-1],
                                        cfg["swin_depth"],
                                        cfg["window_size"],
                                        cfg["mlp_ratio"], None)
        self.patch_deembed = PatchDeEmbed(cfg["in_freq"], cfg["in_dim"],
                                          tuple(cfg["patch_size"]), h[-1])

    def encode(self, hs, s, qs, shape):  # csrvq.py:131-158
        H, W = shape
        code0 = qs[0].encode(hs[-1])
        if s == 1:
            return code0.unsqueeze(1)
        dec = qs[0].decode(code0)
        codes = [code0]
        for i in range(s - 1):
            ci = qs[i + 1].encode(hs[-1 - i] - dec)
            codes.append(ci)
            if len(codes) == s:
                break
            dec = qs[i + 1].decode(ci) + dec
            dec, H, W = self.blocks[i](dec, H, W)
        return torch.stack(codes, 1)

    def decode(self, codes, qs, shape):  # csrvq.py:160-183
        H, W = shape
        s = codes.shape[1]
        dec = qs[0].decode(codes[:, 0])
        for i in range(len(self.blocks)):
            if i < s - 1:
                dec = qs[i + 1].decode(codes[:, i + 1]) + dec
            dec, H, W = self.blocks[i](dec, H, W)
        dec, H, W = self.post_nn(dec, H, W)
        return self.patch_deembed(dec)


class ESCMirror(nn.Module):
    """Minimal reference-equivalent ESC: encode/decode only."""

    def __init__(self, **cfg):
        super().__init__()
        self.cfg = cfg
        h = cfg["h_dims"]
        dec_h = h[::-1]
        Hb = cfg["in_freq"] // cfg["patch_size"][0]
        ms = cfg["max_streams"]
        qs = [ProductVQ(dec_h[0], Hb // 2 ** (ms - 1), cfg["overlap"],
                        cfg["group_size"], cfg["codebook_dims"][0],
                        cfg["codebook_size"], cfg["l2norm"])]
        for i in range(1, ms):
            qs.append(ProductVQ(dec_h[i - 1], Hb // 2 ** (ms - i),
                                cfg["overlap"], cfg["group_size"],
                                cfg["codebook_dims"][i],
                                cfg["codebook_size"], cfg["l2norm"]))
        self.quantizers = nn.ModuleList(qs)
        self.encoder = Encoder(cfg)
        self.decoder = CSRVQDecoder(cfg)

    @torch.no_grad()
    def encode(self, x, num_streams):
        feat = stft(x, self.cfg["in_freq"])
        hs, shape = self.encoder(feat)
        return self.decoder.encode(hs, num_streams, self.quantizers,
                                   shape), shape

    @torch.no_grad()
    def decode(self, codes, shape):
        feat = self.decoder.decode(codes, self.quantizers, shape)
        return istft(feat, self.cfg["in_freq"])


# --------------------------------------------------- RVQ ablation mirror
class RVQ(nn.Module):  # quantization.py:139-274 (bottleneck variant)
    def __init__(self, hidden_dim, num_vqs, cb_dim, cb_size, l2norm):
        super().__init__()
        self.do_proj = hidden_dim != cb_dim
        if self.do_proj:
            self.proj_down = nn.Linear(hidden_dim, cb_dim, bias=False)
            self.proj_up = nn.Linear(cb_dim, hidden_dim, bias=False)
        self.vqs = nn.ModuleList(
            [Codebook(cb_dim, cb_size, l2norm) for _ in range(num_vqs)])

    def quantize_to_code(self, z, s):  # quantization.py:223-237
        codes, residual = [], z
        for i in range(s):
            c = self.vqs[i].encode(residual)
            codes.append(c)
            if len(codes) == s:
                break
            residual = residual - self.vqs[i].decode(c)
        return torch.stack(codes, 1)

    def dequantize_code(self, codes):
        z = 0.0
        for i in range(codes.shape[1]):
            z = z + self.vqs[i].decode(codes[:, i])
        return z


class ProductRVQ(nn.Module):  # quantization.py:276-378
    def __init__(self, in_dim, in_freq, overlap, num_pvqs, num_rvqs,
                 cb_dim, cb_size, l2norm):
        super().__init__()
        self.in_freq, self.overlap = in_freq, overlap
        self.fix_dim = in_freq * in_dim
        total = self.fix_dim * overlap
        if total % num_pvqs == 0:
            self.dims = [total // num_pvqs] * num_pvqs
        else:
            self.dims = [total // num_pvqs] * (num_pvqs - 1)
            self.dims.append(total - sum(self.dims))
        self.vqs = nn.ModuleList([
            RVQ(d, num_rvqs, cb_dim, cb_size, l2norm) for d in self.dims])

    def _pre(self, z):
        B, L, C = z.shape
        H = self.in_freq
        z = z.reshape(B, H, L // H, C).permute(0, 2, 3, 1).reshape(
            B, L // H, self.fix_dim)
        if self.overlap > 1:
            z = z.reshape(B, -1, self.overlap * self.fix_dim)
        return z

    def _post(self, z):
        B = z.shape[0]
        if self.overlap > 1:
            z = z.reshape(B, -1, self.fix_dim)
        W = z.shape[1]
        H = self.in_freq
        return z.reshape(B, W, -1, H).permute(0, 3, 1, 2).reshape(
            B, H * W, -1)

    def encode(self, z, s):
        z = self._pre(z)
        codes, off = [], 0
        for m, rvq in enumerate(self.vqs):
            zm = z[..., off:off + self.dims[m]]
            zm = rvq.proj_down(zm) if rvq.do_proj else zm
            codes.append(rvq.quantize_to_code(zm, s))
            off += self.dims[m]
        return torch.stack(codes, 2)

    def decode(self, codes):
        zq = []
        for m, rvq in enumerate(self.vqs):
            z = rvq.dequantize_code(codes[..., m, :])
            zq.append(rvq.proj_up(z) if rvq.do_proj else z)
        return self._post(torch.cat(zq, -1))


class PlainDecoder(nn.Module):  # base.py:161-203
    def __init__(self, cfg):
        super().__init__()
        h = cfg["h_dims"][::-1]
        heads = cfg["swin_heads"][::-1]
        self.blocks = nn.ModuleList([
            TransformerLayer(h[i], h[i + 1], heads[i], cfg["swin_depth"],
                             cfg["window_size"], cfg["mlp_ratio"], "up")
            for i in range(len(h) - 1)])
        self.post_nn = TransformerLayer(h[-1], h[-1], heads[-1],
                                        cfg["swin_depth"],
                                        cfg["window_size"],
                                        cfg["mlp_ratio"], None)
        self.patch_deembed = PatchDeEmbed(cfg["in_freq"], cfg["in_dim"],
                                          tuple(cfg["patch_size"]), h[-1])

    def forward(self, z, shape):
        H, W = shape
        for blk in self.blocks:
            z, H, W = blk(z, H, W)
        z, H, W = self.post_nn(z, H, W)
        return self.patch_deembed(z)


class RVQMirror(nn.Module):
    """Reference-equivalent RVQCodecs (codecs.py:96-181): encode/decode."""

    def __init__(self, **cfg):
        super().__init__()
        self.cfg = cfg
        dec_h = cfg["h_dims"][::-1]
        Hb = cfg["in_freq"] // cfg["patch_size"][0]
        ms = cfg["max_streams"]
        self.quantizers = ProductRVQ(
            dec_h[0], Hb // 2 ** (ms - 1), cfg["overlap"],
            cfg["group_size"], cfg["num_rvqs"], cfg["codebook_dim"],
            cfg["codebook_size"], cfg["l2norm"])
        self.encoder = Encoder(cfg)
        self.decoder = PlainDecoder(cfg)

    @torch.no_grad()
    def encode(self, x, s):
        hs, shape = self.encoder(stft(x, self.cfg["in_freq"]))
        return self.quantizers.encode(hs[-1], s), shape

    @torch.no_grad()
    def decode(self, codes, shape):
        zq = self.quantizers.decode(codes)
        return istft(self.decoder(zq, shape), self.cfg["in_freq"])


# ------------------------------------------------- training-mode mirror
# STE + per-sample VQ losses (codebook.py:57-77, quantization.py:32-72),
# cross-scale training decode with transmit masking (csrvq.py:23-49,
# 105-130), and the generator losses (generator_loss.py) with the
# torchaudio MelSpectrogram composed from torch.stft + the HTK filterbank
# (torchaudio itself is absent in this image).

def _codebook_forward(self, z_e):  # codebook.py:57-77 (training branch)
    code = self.encode(z_e)
    z_q = self.decode(code)
    cm = F.mse_loss(z_q.detach(), z_e, reduction="none").mean([1, 2])
    cb = F.mse_loss(z_q, z_e.detach(), reduction="none").mean([1, 2])
    z_q = z_e + (z_q - z_e).detach()  # straight-through estimator
    return z_q, code, cb, cm


Codebook.forward = _codebook_forward


def _pvq_forward(self, z, freeze=False):  # quantization.py:32-72
    z = self._pre(z)
    z_qs, codes, s = [], [], 0
    cb_loss, cm_loss = 0.0, 0.0
    for m, (dp, up, vq) in enumerate(zip(self.down_projs, self.up_projs,
                                         self.vqs)):
        z_e_m = dp(z[..., s:s + self.dims[m]])
        z_q_m, code, cb, cm = vq(z_e_m)
        if freeze:  # codebook frozen in pretraining (quantization.py:56-60)
            z_q_m = z_q_m * 0.0 + z_e_m
            cb, cm = cb * 0.0, cm * 0.0
        z_qs.append(up(z_q_m))
        codes.append(code)
        cb_loss = cb_loss + cb
        cm_loss = cm_loss + cm
        s += self.dims[m]
    return {"z_q": self._post(torch.cat(z_qs, -1)),
            "codes": torch.stack(codes, 1),
            "cb_loss": cb_loss / len(self.dims),
            "cm_loss": cm_loss / len(self.dims)}


ProductVQ.forward = _pvq_forward


def _csrvq_forward_train(self, enc_hs, num_streams, qs, shape,
                         freeze=False):  # csrvq.py:105-130
    H, W = shape

    def one(enc, dec, vq, transmit):  # csrvq.py:23-49
        out = vq(enc - dec, freeze)
        rq, code = out["z_q"], out["codes"]
        cm, cb = out["cm_loss"], out["cb_loss"]
        if not transmit:  # masking non-transmitted streams
            cm, cb, rq = cm * 0.0, cb * 0.0, rq * 0.0
        return rq + dec, cm, cb, code

    z0, cm_loss, cb_loss, code = one(enc_hs[-1], 0.0, qs[0], True)
    codes, dec = [code], z0
    for i, blk in enumerate(self.blocks):
        d_ref, cm_i, cb_i, code_i = one(enc_hs[-1 - i], dec, qs[i + 1],
                                        i < num_streams - 1)
        cm_loss = cm_loss + cm_i
        cb_loss = cb_loss + cb_i
        codes.append(code_i)
        dec, H, W = blk(d_ref, H, W)
    dec, H, W = self.post_nn(dec, H, W)
    recon_feat = self.patch_deembed(dec)
    return recon_feat, torch.stack(codes, 1), cm_loss, cb_loss


CSRVQDecoder.forward_train = _csrvq_forward_train


def _esc_forward(self, x, num_streams, freeze_codebook=False):
    """codecs.py:30-69 forward_one_step (training path)."""
    if freeze_codebook:
        num_streams = self.cfg["max_streams"]
    x_feat = stft(x, self.cfg["in_freq"])
    enc_hs, feat_shape = self.encoder(x_feat)
    recon_feat, codes, cm_loss, cb_loss = self.decoder.forward_train(
        enc_hs, num_streams, self.quantizers, feat_shape, freeze_codebook)
    recon_x = istft(recon_feat, self.cfg["in_freq"])
    return {"cm_loss": cm_loss, "cb_loss": cb_loss, "raw_audio": x,
            "recon_audio": recon_x, "raw_feat": x_feat,
            "recon_feat": recon_feat, "codes": codes}


ESCMirror.forward = _esc_forward


def complex_stft_loss(raw_feat, recon_feat, power=0.3, eps=1e-10):
    """generator_loss.py:12-35 (power-law compressed L2), (B,)."""
    def pl(s):
        return torch.sign(s) * (torch.abs(s) + eps) ** power
    return F.mse_loss(pl(raw_feat), pl(recon_feat),
                      reduction="none").mean([1, 2, 3])


def mel_spectrogram_loss(x, y, clamp_eps=1e-5, sr=16000):
    """generator_loss.py:37-75: 7-scale L1 mel + log-mel, (B,)."""
    import numpy as np

    from esc_tpu.ops.mel import MEL_BINS, MEL_WINDOWS, mel_filterbank

    loss = 0.0
    for w, m in zip(MEL_WINDOWS, MEL_BINS):
        fb = torch.from_numpy(np.asarray(mel_filterbank(w // 2 + 1, m, sr),
                                         dtype=np.float32)).to(x.dtype)
        win = torch.hann_window(w, dtype=x.dtype)

        def mel(a):
            s = torch.stft(a, n_fft=w, hop_length=w // 4, win_length=w,
                           window=win, center=True, pad_mode="reflect",
                           return_complex=True).abs()
            return torch.einsum("bft,fm->bmt", s, fb)

        xm, ym = mel(x), mel(y)
        loss = loss + F.l1_loss(xm, ym, reduction="none").mean([1, 2])
        loss = loss + F.l1_loss(
            xm.clamp(min=clamp_eps).pow(2).log10(),
            ym.clamp(min=clamp_eps).pow(2).log10(),
            reduction="none").mean([1, 2])
    return loss
