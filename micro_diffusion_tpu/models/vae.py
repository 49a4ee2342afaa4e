"""AutoencoderKL (SD/SDXL VAE) in JAX - frozen encode/decode for latent diffusion.

Replaces the diffusers AutoencoderKL dependency (reference model.py:379-384,
precompute.py:182-194): conv encoder -> diagonal Gaussian latents (x scaling_factor),
conv decoder for generate(). Architecture follows the standard f8 KL autoencoder:
4-level encoder/decoder (block_out_channels, layers_per_block resnets), GroupNorm(32),
SiLU, single mid attention block; supports the 4-ch SDXL VAE and the 16-ch
ostris/vae-kl-f8-d16 variant via ``latent_channels``.

Weight loading: diffusers state-dict naming is converted mechanically
(vae_torch_to_params); configs load from a local HF snapshot (zero-egress environment).
Layout: public API is NCHW (reference parity); compute is NHWC (TPU-native conv layout).
"""

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _conv(features, kernel=3, stride=1, name=None, padding=None,
          dtype=jnp.float32):
    if padding is None:
        padding = [(kernel // 2, kernel // 2)] * 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=padding,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class ResnetBlock(nn.Module):
    # compute dtype for convs; GroupNorm statistics stay float32 (flax
    # normalization promotes to fp32 internally). bf16 is reference parity:
    # the reference loads the whole VAE with torch_dtype=bfloat16 and encodes
    # /decodes in it (model.py:112-113,349-350,379-382).
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, name="conv1", dtype=self.dtype)(h)
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, name="conv2", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, kernel=1, name="conv_shortcut",
                      dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over H*W tokens (VAE mid block)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(y), dense("to_k")(y), dense("to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) * (c**-0.5)
        # softmax in fp32 regardless of compute dtype (4096-token rows at
        # 512px decode; bf16 exp/sum loses visible precision)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn.astype(y.dtype), v)
        y = dense("to_out_0")(y)
        return res + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.block_out_channels[0], name="conv_in",
                  dtype=self.dtype)(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, name=f"down_{i}_resnet_{j}",
                                dtype=self.dtype)(h)
            if i < len(self.block_out_channels) - 1:
                # stride-2 conv with asymmetric (0,1) padding (diffusers Downsample2D)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = _conv(ch, stride=2, padding=[(0, 0), (0, 0)],
                          name=f"down_{i}_downsample", dtype=self.dtype)(h)
        ch = self.block_out_channels[-1]
        h = ResnetBlock(ch, name="mid_resnet_0", dtype=self.dtype)(h)
        h = AttnBlock(ch, name="mid_attn", dtype=self.dtype)(h)
        h = ResnetBlock(ch, name="mid_resnet_1", dtype=self.dtype)(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        # moments in fp32: the latent distribution feeds training targets
        return _conv(2 * self.latent_channels, name="conv_out")(
            h.astype(jnp.float32))


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        chans = list(reversed(self.block_out_channels))  # [512, 512, 256, 128]
        h = _conv(chans[0], name="conv_in", dtype=self.dtype)(z)
        h = ResnetBlock(chans[0], name="mid_resnet_0", dtype=self.dtype)(h)
        h = AttnBlock(chans[0], name="mid_attn", dtype=self.dtype)(h)
        h = ResnetBlock(chans[0], name="mid_resnet_1", dtype=self.dtype)(h)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock(ch, name=f"up_{i}_resnet_{j}",
                                dtype=self.dtype)(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = _conv(ch, name=f"up_{i}_upsample", dtype=self.dtype)(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        # final image in fp32 (pixel values for FID/saving)
        return _conv(self.out_channels, name="conv_out")(
            h.astype(jnp.float32))


class AutoencoderKLModule(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    out_channels: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block,
            self.latent_channels, dtype=self.dtype,
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, self.out_channels,
            dtype=self.dtype,
        )
        self.quant_conv = _conv(2 * self.latent_channels, kernel=1, name="quant_conv")
        self.post_quant_conv = _conv(
            self.latent_channels, kernel=1, name="post_quant_conv"
        )

    def encode_moments(self, x):
        """NHWC image -> (mean, logvar) latents, NHWC."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        mean, logvar = self.encode_moments(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z), mean, logvar


class AutoencoderKL:
    """User-facing frozen VAE with the reference call surface (NCHW):

        vae.encode(images, rng)  -> sampled latents * 1.0 (caller applies scaling)
        vae.encode_mode(images)  -> distribution mean
        vae.decode(latents)      -> images in [-1, 1]
        vae.scaling_factor
    """

    def __init__(
        self,
        params: Optional[Dict] = None,
        block_out_channels: Sequence[int] = (128, 256, 512, 512),
        layers_per_block: int = 2,
        latent_channels: int = 4,
        scaling_factor: float = 0.13025,
        compute_dtype: Any = jnp.float32,
    ):
        # compute_dtype=bf16 is reference parity (the reference loads the VAE
        # with torch_dtype=bfloat16, model.py:379-382); params stay fp32, all
        # normalization statistics fp32, encoder moments / decoded pixels
        # emitted fp32. Default fp32 = the oracle-validated numerics.
        self.module = AutoencoderKLModule(
            tuple(block_out_channels), layers_per_block, latent_channels,
            dtype=jnp.dtype(compute_dtype),
        )
        self.latent_channels = latent_channels
        self.scaling_factor = scaling_factor
        self.params = params
        self._jit_encode = jax.jit(
            lambda p, x, r: self.module.apply(p, x, method="encode_moments")
        )
        self._jit_decode = jax.jit(
            lambda p, z: self.module.apply(p, z, method="decode")
        )

    def init(self, rng, image_size: int = 64):
        x = jnp.zeros((1, image_size, image_size, 3))
        self.params = jax.jit(
            lambda: self.module.init(rng, x, jax.random.PRNGKey(0))
        )()
        return self.params

    # ------------------------------------------------------------------ API (NCHW)

    def encode(self, images, rng=None) -> jax.Array:
        """Sampled latents (like diffusers .latent_dist.sample()); NCHW in/out."""
        x = jnp.transpose(jnp.asarray(images, jnp.float32), (0, 2, 3, 1))
        mean, logvar = self._jit_encode(self.params, x, None)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return jnp.transpose(z, (0, 3, 1, 2))

    def encode_mode(self, images) -> jax.Array:
        x = jnp.transpose(jnp.asarray(images, jnp.float32), (0, 2, 3, 1))
        mean, _ = self._jit_encode(self.params, x, None)
        return jnp.transpose(mean, (0, 3, 1, 2))

    def decode(self, latents) -> jax.Array:
        z = jnp.transpose(jnp.asarray(latents, jnp.float32), (0, 2, 3, 1))
        img = self._jit_decode(self.params, z)
        return jnp.transpose(img, (0, 3, 1, 2))

    # ------------------------------------------------------------------ loading

    @classmethod
    def from_pretrained(
        cls, name: str, weights_dir: Optional[str] = None,
        subfolder: str = "vae", compute_dtype: Any = jnp.float32,
    ) -> "AutoencoderKL":
        """Load from a local HF snapshot directory (config.json + weights).

        ``weights_dir`` points at the model root; the SDXL repo keeps the VAE under a
        'vae' subfolder, ostris/vae-kl-f8-d16 at the root (reference model.py:381).
        """
        if weights_dir is None:
            raise FileNotFoundError(
                f"no local weights for VAE '{name}': pass weights_dir with a local HF "
                "snapshot (zero-egress environment)"
            )
        root = weights_dir
        if name != "ostris/vae-kl-f8-d16" and os.path.isdir(
            os.path.join(root, subfolder)
        ):
            root = os.path.join(root, subfolder)
        with open(os.path.join(root, "config.json")) as f:
            cfg = json.load(f)
        from .text_encoders import load_state_dict_from_dir

        sd = load_state_dict_from_dir(root)
        vae = cls(
            block_out_channels=cfg.get("block_out_channels", (128, 256, 512, 512)),
            layers_per_block=cfg.get("layers_per_block", 2),
            latent_channels=cfg.get("latent_channels", 4),
            scaling_factor=cfg.get("scaling_factor", 0.13025),
            compute_dtype=compute_dtype,
        )
        vae.params = vae_torch_to_params(
            sd,
            num_blocks=len(vae.module.block_out_channels),
            layers_per_block=vae.module.layers_per_block,
        )
        return vae


# ---------------------------------------------------------------- weight conversion


def _np(v) -> np.ndarray:
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v, np.float32)


def _put_conv(p, dst, sd, src):
    p[dst] = {
        "kernel": _np(sd[f"{src}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{src}.bias"]),
    }


def _put_norm(p, dst, sd, src):
    p[dst] = {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])}


def _put_dense(p, dst, sd, src):
    p[dst] = {"kernel": _np(sd[f"{src}.weight"]).T, "bias": _np(sd[f"{src}.bias"])}


def _convert_resnet(p, dst_prefix, sd, src_prefix):
    blk: Dict[str, Any] = {}
    _put_norm(blk, "norm1", sd, f"{src_prefix}.norm1")
    _put_conv(blk, "conv1", sd, f"{src_prefix}.conv1")
    _put_norm(blk, "norm2", sd, f"{src_prefix}.norm2")
    _put_conv(blk, "conv2", sd, f"{src_prefix}.conv2")
    if f"{src_prefix}.conv_shortcut.weight" in sd:
        _put_conv(blk, "conv_shortcut", sd, f"{src_prefix}.conv_shortcut")
    p[dst_prefix] = blk


def _convert_attn(p, dst, sd, src):
    blk: Dict[str, Any] = {}
    _put_norm(blk, "group_norm", sd, f"{src}.group_norm")
    for name in ("to_q", "to_k", "to_v"):
        _put_dense(blk, name, sd, f"{src}.{name}")
    _put_dense(blk, "to_out_0", sd, f"{src}.to_out.0")
    p[dst] = blk


def vae_torch_to_params(
    state_dict: Dict[str, Any], num_blocks: int = 4, layers_per_block: int = 2
) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> our flax params."""
    sd = state_dict
    enc: Dict[str, Any] = {}
    _put_conv(enc, "conv_in", sd, "encoder.conv_in")
    for i in range(num_blocks):
        for j in range(layers_per_block):
            _convert_resnet(
                enc, f"down_{i}_resnet_{j}", sd,
                f"encoder.down_blocks.{i}.resnets.{j}",
            )
        if i < num_blocks - 1:
            _put_conv(
                enc, f"down_{i}_downsample", sd,
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
            )
    _convert_resnet(enc, "mid_resnet_0", sd, "encoder.mid_block.resnets.0")
    _convert_attn(enc, "mid_attn", sd, "encoder.mid_block.attentions.0")
    _convert_resnet(enc, "mid_resnet_1", sd, "encoder.mid_block.resnets.1")
    _put_norm(enc, "conv_norm_out", sd, "encoder.conv_norm_out")
    _put_conv(enc, "conv_out", sd, "encoder.conv_out")

    dec: Dict[str, Any] = {}
    _put_conv(dec, "conv_in", sd, "decoder.conv_in")
    _convert_resnet(dec, "mid_resnet_0", sd, "decoder.mid_block.resnets.0")
    _convert_attn(dec, "mid_attn", sd, "decoder.mid_block.attentions.0")
    _convert_resnet(dec, "mid_resnet_1", sd, "decoder.mid_block.resnets.1")
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_resnet(
                dec, f"up_{i}_resnet_{j}", sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i < num_blocks - 1:
            _put_conv(
                dec, f"up_{i}_upsample", sd,
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
            )
    _put_norm(dec, "conv_norm_out", sd, "decoder.conv_norm_out")
    _put_conv(dec, "conv_out", sd, "decoder.conv_out")

    p = {"encoder": enc, "decoder": dec}
    _put_conv(p, "quant_conv", sd, "quant_conv")
    _put_conv(p, "post_quant_conv", sd, "post_quant_conv")
    return {"params": p}
