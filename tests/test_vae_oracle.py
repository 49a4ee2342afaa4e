"""VAE numerics validation against a torch oracle (VERDICT.md next-round #5).

The oracle replicates diffusers AutoencoderKL's graph and state-dict naming
(encoder.down_blocks.N.resnets.M..., mid_block.attentions.0.to_q, Downsample2D's
asymmetric (0,1,0,1) pad, nearest-2x upsample) at a tiny config, so
``vae_torch_to_params`` converts its real state_dict and the JAX forward must match:
a wrong GroupNorm/resnet ordering or pad convention fails loudly here
(reference model.py:379-384, precompute.py:182-194).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from micro_diffusion_tpu.models.vae import AutoencoderKL, vae_torch_to_params

GROUPS = 32  # diffusers default norm_num_groups; config channels must divide


class _Resnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _Attn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
        y = self.to_out[0](attn @ v)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class _Down(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # diffusers Downsample2D


class _TorchVAE(nn.Module):
    """diffusers-AutoencoderKL-shaped oracle (tiny config, exact naming)."""

    def __init__(self, chans=(32, 64), layers=1, latent=4):
        super().__init__()
        e = self.encoder = nn.Module()
        e.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        e.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [_Resnet(cin if j == 0 else ch, ch) for j in range(layers)]
            )
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
            e.down_blocks.append(blk)
            cin = ch
        e.mid_block = nn.Module()
        e.mid_block.resnets = nn.ModuleList([_Resnet(cin, cin), _Resnet(cin, cin)])
        e.mid_block.attentions = nn.ModuleList([_Attn(cin)])
        e.conv_norm_out = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        e.conv_out = nn.Conv2d(cin, 2 * latent, 3, padding=1)

        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

        d = self.decoder = nn.Module()
        rchans = list(reversed(chans))
        d.conv_in = nn.Conv2d(latent, rchans[0], 3, padding=1)
        d.mid_block = nn.Module()
        d.mid_block.resnets = nn.ModuleList(
            [_Resnet(rchans[0], rchans[0]), _Resnet(rchans[0], rchans[0])]
        )
        d.mid_block.attentions = nn.ModuleList([_Attn(rchans[0])])
        d.up_blocks = nn.ModuleList()
        cin = rchans[0]
        for i, ch in enumerate(rchans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [_Resnet(cin if j == 0 else ch, ch) for j in range(layers + 1)]
            )
            if i < len(rchans) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(ch, ch, 3, padding=1)
            d.up_blocks.append(blk)
            cin = ch
        d.conv_norm_out = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        d.conv_out = nn.Conv2d(cin, 3, 3, padding=1)

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for i, blk in enumerate(e.down_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        mean, logvar = self.quant_conv(h).chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for i, blk in enumerate(d.up_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


@pytest.fixture(scope="module")
def oracle_pair():
    torch.manual_seed(0)
    ref = _TorchVAE().eval()
    # shrink init magnitudes so deep silu chains stay well-conditioned
    with torch.no_grad():
        for p in ref.parameters():
            p.mul_(0.5)
    vae = AutoencoderKL(block_out_channels=(32, 64), layers_per_block=1,
                        latent_channels=4, scaling_factor=0.5)
    vae.params = vae_torch_to_params(ref.state_dict(), num_blocks=2,
                                     layers_per_block=1)
    return ref, vae


def test_converter_consumes_every_key(oracle_pair):
    ref, vae = oracle_pair
    import jax

    n_ours = len(jax.tree.leaves(vae.params))
    n_ref = len(ref.state_dict())
    assert n_ours == n_ref, (n_ours, n_ref)


def test_encode_matches_diffusers_oracle(oracle_pair):
    ref, vae = oracle_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = ref.encode_moments(torch.from_numpy(x))
    mean_j = np.asarray(vae.encode_mode(x))
    np.testing.assert_allclose(mean_j, mean_t.numpy(), atol=2e-4, rtol=1e-3)


def test_decode_matches_diffusers_oracle(oracle_pair):
    ref, vae = oracle_pair
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        img_t = ref.decode(torch.from_numpy(z)).numpy()
    img_j = np.asarray(vae.decode(z))
    np.testing.assert_allclose(img_j, img_t, atol=2e-4, rtol=1e-3)


def test_encode_decode_roundtrip_shapes(oracle_pair):
    _, vae = oracle_pair
    x = np.zeros((1, 3, 32, 32), np.float32)
    import jax

    z = vae.encode(x, rng=jax.random.PRNGKey(0))
    assert z.shape == (1, 4, 16, 16)
    assert vae.decode(z).shape == (1, 3, 32, 32)
