"""Independent torch implementation of the MicroDiT architecture, used ONLY as a test
oracle: we convert our flax params to a torch state dict (models/interop.py), load them
here with strict=True, and compare forward outputs. Because this replica follows the
reference's module semantics and naming (dit.py / utils.py), agreement validates both
our JAX architecture and the checkpoint converter against the torch ecosystem.

Written from the architectural spec (SURVEY.md #2.1), not copied from the reference.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def norm(dim, affine=True, eps=1e-6):
    return nn.LayerNorm(dim, eps=eps, elementwise_affine=affine, bias=False)


class SelfAttention(nn.Module):
    def __init__(self, dim, num_heads, hidden_dim=None, bias=True):
        super().__init__()
        hidden_dim = hidden_dim or dim
        self.h = num_heads
        self.hd = hidden_dim // num_heads
        self.qkv = nn.Linear(dim, hidden_dim * 3, bias=bias)
        self.proj = nn.Linear(hidden_dim, dim, bias=bias)
        self.ln_q = norm(hidden_dim, affine=False)
        self.ln_k = norm(hidden_dim, affine=False)

    def forward(self, x):
        b, n, _ = x.shape
        q, k, v = self.qkv(x).reshape(b, n, 3, self.h * self.hd).unbind(2)
        q = self.ln_q(q).reshape(b, n, self.h, self.hd)
        k = self.ln_k(k).reshape(b, n, self.h, self.hd)
        v = v.reshape(b, n, self.h, self.hd)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        return self.proj(o.transpose(1, 2).reshape(b, n, self.h * self.hd))


class CrossAttention(nn.Module):
    def __init__(self, dim, num_heads, hidden_dim=None, bias=True):
        super().__init__()
        hidden_dim = hidden_dim or dim
        self.h = num_heads
        self.hd = hidden_dim // num_heads
        self.q_linear = nn.Linear(dim, hidden_dim, bias=bias)
        self.kv_linear = nn.Linear(dim, hidden_dim * 2, bias=bias)
        self.proj = nn.Linear(hidden_dim, dim, bias=bias)
        self.ln_q = norm(hidden_dim, affine=False)
        self.ln_k = norm(hidden_dim, affine=False)

    def forward(self, x, cond):
        b, n, _ = x.shape
        l = cond.shape[-2]
        cond = cond.reshape(b, l, cond.shape[-1])
        q = self.ln_q(self.q_linear(x)).reshape(b, n, self.h, self.hd)
        k, v = self.kv_linear(cond).reshape(b, l, 2, self.h * self.hd).unbind(2)
        k = self.ln_k(k).reshape(b, l, self.h, self.hd)
        v = v.reshape(b, l, self.h, self.hd)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        return self.proj(o.transpose(1, 2).reshape(b, n, self.h * self.hd))


class FeedForward(nn.Module):
    def __init__(self, dim, hidden_dim, multiple_of, bias=True):
        super().__init__()
        h = int(2 * hidden_dim / 3)
        h = multiple_of * ((h + multiple_of - 1) // multiple_of)
        self.w1 = nn.Linear(dim, h, bias=bias)
        self.w2 = nn.Linear(dim, h, bias=bias)
        self.w3 = nn.Linear(h, dim, bias=bias)

    def forward(self, x):
        return self.w3(F.silu(self.w1(x)) * self.w2(x))


class FeedForwardECMoe(nn.Module):
    def __init__(self, num_experts, capacity, dim, hidden_dim, multiple_of):
        super().__init__()
        h = multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)
        self.e = num_experts
        self.capacity = capacity
        self.w1 = nn.Parameter(torch.zeros(num_experts, dim, h))
        self.w2 = nn.Parameter(torch.zeros(num_experts, h, dim))
        self.gate = nn.Linear(dim, num_experts, bias=False)

    def forward(self, x):
        n, t, d = x.shape
        k = int(self.capacity * t / self.e)
        probs = F.softmax(self.gate(x), dim=-1)
        g, m = torch.topk(probs.permute(0, 2, 1), k, dim=-1)
        p = F.one_hot(m, num_classes=t).float()
        xin = torch.einsum("nekt,ntd->nekd", p, x)
        h = torch.einsum("nekd,edf->nekf", xin, self.w1)
        h = F.gelu(h)
        h = torch.einsum("nekf,efd->nekd", h, self.w2)
        return torch.einsum("nekt,nekd->ntd", p, g.unsqueeze(-1) * h)


class Mlp(nn.Module):
    def __init__(self, din, dh, dout, use_norm=True, bias=True):
        super().__init__()
        self.fc1 = nn.Linear(din, dh, bias=bias)
        self.norm = norm(dh) if use_norm else nn.Identity()
        self.fc2 = nn.Linear(dh, dout, bias=bias)

    def forward(self, x):
        return self.fc2(self.norm(F.gelu(self.fc1(x), approximate="tanh")))


class AttentionBlockPromptEmbedding(nn.Module):
    def __init__(self, dim, head_dim, multiple_of, bias):
        super().__init__()
        self.norm1 = norm(dim)
        self.attn = SelfAttention(dim, dim // head_dim, bias=bias)
        self.norm2 = norm(dim)
        self.mlp = FeedForward(dim, int(dim * 4.0), multiple_of, bias=bias)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TimestepEmbedder(nn.Module):
    def __init__(self, dim, freq=512):
        super().__init__()
        self.freq = freq
        self.mlp = nn.Sequential(
            nn.Linear(freq, dim), nn.GELU(approximate="tanh"), nn.Linear(dim, dim)
        )

    def forward(self, t):
        half = self.freq // 2
        freqs = torch.exp(
            -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class DiTBlock(nn.Module):
    def __init__(self, dim, head_dim, mlp_ratio, qkv_ratio, multiple_of, pooled_dim,
                 bias, moe, num_experts, capacity):
        super().__init__()
        qh = (
            dim if qkv_ratio == 1
            else (2 * head_dim) * ((int(dim * qkv_ratio) + 2 * head_dim - 1)
                                   // (2 * head_dim))
        )
        self.norm1 = norm(dim)
        self.attn = SelfAttention(dim, qh // head_dim, hidden_dim=qh, bias=bias)
        self.cross_attn = CrossAttention(dim, dim // head_dim, bias=bias)
        self.norm2 = norm(dim)
        self.norm3 = norm(dim)
        mh = int(dim * mlp_ratio)
        self.mlp = (
            FeedForwardECMoe(num_experts, capacity, dim, mh, multiple_of)
            if moe else FeedForward(dim, mh, multiple_of, bias=bias)
        )
        self.adaLN_modulation = nn.Sequential(
            nn.GELU(approximate="tanh"), nn.Linear(pooled_dim, 6 * dim)
        )

    def forward(self, x, y, c):
        s1, sc1, g1, s2, sc2, g2 = self.adaLN_modulation(c).chunk(6, dim=1)
        x = x + g1.unsqueeze(1) * self.attn(modulate(self.norm1(x), s1, sc1))
        x = x + self.cross_attn(self.norm2(x), y)
        x = x + g2.unsqueeze(1) * self.mlp(modulate(self.norm3(x), s2, sc2))
        return x


class TorchMicroDiT(nn.Module):
    """Unmasked forward of the full architecture (mask path is gather/scatter tested
    elsewhere); mirrors the reference module/naming structure."""

    def __init__(self, input_size, patch_size, in_channels, dim, depth, head_dim,
                 multiple_of, caption_channels, qkv_multipliers, ffn_multipliers,
                 mixer_depth, mixer_dim, bias, num_experts, capacity,
                 experts_every_n=2, pos_embed=None):
        super().__init__()
        self.p = patch_size
        self.out_ch = in_channels

        class XEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(in_channels, dim, patch_size, patch_size)

            def forward(self, x):
                return self.proj(x).flatten(2).transpose(1, 2)

        self.x_embedder = XEmb()
        self.t_embedder = TimestepEmbedder(dim)
        self.register_buffer(
            "pos_embed", torch.from_numpy(pos_embed).float()[None]
        )

        class YEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.y_proj = Mlp(caption_channels, dim, dim)

            def forward(self, y):
                return self.y_proj(y)

        self.y_embedder = YEmb()
        self.y_emb_preprocess = AttentionBlockPromptEmbedding(
            dim, head_dim, multiple_of, bias
        )
        self.pooled_y_emb_process = Mlp(dim, dim, dim)

        mixer_moe = [
            i in {j for j in range(1, mixer_depth) if (j + 1) % experts_every_n == 0}
            for i in range(mixer_depth)
        ]
        self.patch_mixer = nn.ModuleList([
            DiTBlock(mixer_dim, head_dim, 4.0, 1.0, multiple_of, dim, bias,
                     mixer_moe[i], num_experts, capacity)
            for i in range(mixer_depth)
        ])
        self.patch_mixer_map_xin = nn.Sequential(
            norm(dim), nn.Linear(dim, mixer_dim, bias=bias)
        )
        self.patch_mixer_map_xout = nn.Sequential(
            norm(mixer_dim), nn.Linear(mixer_dim, dim, bias=bias)
        )
        self.patch_mixer_map_y = nn.Sequential(
            norm(dim), nn.Linear(dim, mixer_dim, bias=bias)
        )

        moe = [
            i in {j for j in range(1, depth - 1) if (j + 1) % experts_every_n == 0}
            for i in range(depth)
        ]
        self.blocks = nn.ModuleList([
            DiTBlock(dim, head_dim, ffn_multipliers[i], qkv_multipliers[i],
                     multiple_of, dim, bias, moe[i], num_experts, capacity)
            for i in range(depth)
        ])

        class Final(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(dim, patch_size**2 * in_channels)
                self.adaLN_modulation = nn.Sequential(
                    nn.GELU(approximate="tanh"), nn.Linear(dim, 2 * dim)
                )
                self.norm_final = norm(dim)

            def forward(self, x, c):
                shift, scale = self.adaLN_modulation(c).chunk(2, dim=1)
                return self.linear(modulate(self.norm_final(x), shift, scale))

        self.final_layer = Final()

    def forward(self, x, t, y):
        b = x.shape[0]
        x = self.x_embedder(x) + self.pos_embed
        t = self.t_embedder(t.expand(b))
        y = self.y_embedder(y)
        y = self.y_emb_preprocess(y.squeeze(1)).unsqueeze(1)
        c = t + self.pooled_y_emb_process(y.mean(dim=-2).squeeze(1))
        xm = self.patch_mixer_map_xin(x)
        ym = self.patch_mixer_map_y(y)
        for blk in self.patch_mixer:
            xm = blk(xm, ym, c)
        x = self.patch_mixer_map_xout(xm)
        for blk in self.blocks:
            x = blk(x, y, c)
        x = self.final_layer(x, c)
        h = w = int(x.shape[1] ** 0.5)
        x = x.reshape(b, h, w, self.p, self.p, self.out_ch)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, self.out_ch, h * self.p, w * self.p)
