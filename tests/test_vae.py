"""VAE tests: structure (f8 down/upsampling, shapes), converter completeness against a
diffusers-named synthetic state dict, and encode/decode smoke. (diffusers itself is not
installed in this environment, so numerics-vs-diffusers runs where weights exist.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micro_diffusion_tpu.models.vae import (
    AutoencoderKL,
    AutoencoderKLModule,
    vae_torch_to_params,
)


def tiny_vae(latent_channels=4):
    return AutoencoderKL(
        block_out_channels=(32, 32, 64, 64),
        layers_per_block=1,
        latent_channels=latent_channels,
        scaling_factor=0.5,
    )


def test_encode_decode_shapes():
    vae = tiny_vae()
    vae.init(jax.random.PRNGKey(0), image_size=32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    z = vae.encode(imgs, rng=jax.random.PRNGKey(2))
    assert z.shape == (2, 4, 4, 4)  # f8 downsampling
    out = vae.decode(z)
    assert out.shape == (2, 3, 32, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_encode_sampling_statistics():
    vae = tiny_vae()
    vae.init(jax.random.PRNGKey(0), image_size=32)
    imgs = jnp.zeros((1, 3, 32, 32))
    z1 = vae.encode(imgs, rng=jax.random.PRNGKey(1))
    z2 = vae.encode(imgs, rng=jax.random.PRNGKey(2))
    zm = vae.encode_mode(imgs)
    # different rng -> different samples; mode is deterministic
    assert not np.array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(
        np.asarray(vae.encode_mode(imgs)), np.asarray(zm)
    )


def test_16_channel_variant():
    vae = tiny_vae(latent_channels=16)
    vae.init(jax.random.PRNGKey(0), image_size=32)
    z = vae.encode(jnp.zeros((1, 3, 32, 32)), rng=jax.random.PRNGKey(1))
    assert z.shape == (1, 16, 4, 4)


def test_bf16_compute_mode():
    """compute_dtype=bf16 (reference parity: torch_dtype=bfloat16,
    reference model.py:379-382) shares the fp32 param structure and stays
    numerically close to the fp32 oracle-validated path; outputs are fp32."""
    vae32 = tiny_vae()
    params = vae32.init(jax.random.PRNGKey(0), image_size=32)
    vae16 = AutoencoderKL(
        block_out_channels=(32, 32, 64, 64), layers_per_block=1,
        latent_channels=4, scaling_factor=0.5,
        compute_dtype=jnp.bfloat16,
    )
    vae16.params = params  # same fp32 params, different compute dtype
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4))
    img32 = np.asarray(vae32.decode(lat))
    img16 = np.asarray(vae16.decode(lat))
    assert img16.dtype == np.float32  # pixels emitted fp32
    assert img32.shape == img16.shape
    scale = np.abs(img32).mean() + 1e-6
    assert np.abs(img32 - img16).mean() / scale < 0.05
    m32 = np.asarray(vae32.encode_mode(jnp.zeros((1, 3, 32, 32))))
    m16 = np.asarray(vae16.encode_mode(jnp.zeros((1, 3, 32, 32))))
    assert np.abs(m32 - m16).mean() / (np.abs(m32).mean() + 1e-6) < 0.05


def _synthetic_diffusers_state_dict(block_out=(32, 32, 64, 64), layers=1, latent=4):
    """Build a random state dict with exact diffusers AutoencoderKL key names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(
            np.float32
        ) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def dense(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(f"{name}.group_norm", c)
        for x in ("to_q", "to_k", "to_v"):
            dense(f"{name}.{x}", c, c)
        dense(f"{name}.to_out.0", c, c)

    # encoder
    conv("encoder.conv_in", 3, block_out[0])
    cin = block_out[0]
    for i, ch in enumerate(block_out):
        for j in range(layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else ch, ch)
        cin = ch
        if i < len(block_out) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    top = block_out[-1]
    resnet("encoder.mid_block.resnets.0", top, top)
    attn("encoder.mid_block.attentions.0", top)
    resnet("encoder.mid_block.resnets.1", top, top)
    norm("encoder.conv_norm_out", top)
    conv("encoder.conv_out", top, 2 * latent)
    # decoder
    chans = list(reversed(block_out))
    conv("decoder.conv_in", latent, chans[0])
    resnet("decoder.mid_block.resnets.0", chans[0], chans[0])
    attn("decoder.mid_block.attentions.0", chans[0])
    resnet("decoder.mid_block.resnets.1", chans[0], chans[0])
    cin = chans[0]
    for i, ch in enumerate(chans):
        for j in range(layers + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else ch, ch)
        cin = ch
        if i < len(chans) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", chans[-1])
    conv("decoder.conv_out", chans[-1], 3)
    conv("quant_conv", 2 * latent, 2 * latent, k=1)
    conv("post_quant_conv", latent, latent, k=1)
    return sd


def test_converter_structure_matches_init():
    """Converted diffusers-named weights must exactly match the flax init structure -
    both directions (no missing, no extra), so real released weights will load."""
    sd = _synthetic_diffusers_state_dict()
    converted = vae_torch_to_params(sd, num_blocks=4, layers_per_block=1)

    vae = tiny_vae()
    ref = vae.init(jax.random.PRNGKey(0), image_size=32)

    c_flat = {str(k): v for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    r_flat = {str(k): v for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    assert set(c_flat) == set(r_flat), (
        sorted(set(r_flat) - set(c_flat))[:5],
        sorted(set(c_flat) - set(r_flat))[:5],
    )
    for k in c_flat:
        assert c_flat[k].shape == r_flat[k].shape, k

    # and the converted params actually run
    vae.params = jax.tree.map(jnp.asarray, converted)
    z = vae.encode(jnp.zeros((1, 3, 32, 32)), rng=jax.random.PRNGKey(1))
    img = vae.decode(z)
    assert img.shape == (1, 3, 32, 32)
    assert np.all(np.isfinite(np.asarray(img)))
