"""Pallas flash attention vs the XLA reference path: forward and gradients, self- and
cross-attention shapes. Runs in interpreter mode on CPU; the same kernels compile for
TPU (exercised by bench/entry on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_diffusion_tpu.ops.attention import _xla_attention
from micro_diffusion_tpu.ops.flash_attention import flash_attention


def rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "tq,tk,h",
    [
        (64, 64, 4),     # stage-1 masked backbone
        (256, 77, 12),   # mixer/cross shapes, odd head count (full-H block)
        (128, 128, 4),
        (1024, 1024, 16),  # 512px unmasked: head-blocked (8) + q-chunked path
        (1024, 77, 16),    # 512px cross-attention
    ],
)
def test_forward_matches_xla(tq, tk, h):
    b, d = 2, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, None, True)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla_long_seq():
    """Backward with the head-blocked + q-chunked path (dk/dv VMEM accumulation)."""
    b, tq, tk, h, d = 1, 1024, 1024, 16, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, d**-0.5)))

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


def test_gradients_match_xla():
    b, tq, tk, h, d = 2, 64, 77, 2, 32
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, d**-0.5)))

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_custom_scale():
    b, t, h, d = 1, 16, 2, 32
    q, k, v = rand((b, t, h, d), 0), rand((b, t, h, d), 1), rand((b, t, h, d), 2)
    ref = _xla_attention(q, k, v, 0.25)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, 0.25, True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_full_dit_forward_pallas_vs_xla():
    """The whole DiT forward with attention_impl='flash' (interpret mode on CPU)
    must match the XLA attention path - validates the backend swap is numerically
    transparent AND that the impl knob is a static config field, not an env var."""
    from micro_diffusion_tpu.models.dit import DiT

    kw = dict(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=2, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(1.0,),
        ffn_multipliers=(2.0,), use_patch_mixer=True, patch_mixer_depth=1,
        patch_mixer_dim=64, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    model = DiT(**kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 16, 16))
    t = jnp.zeros((2,))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 32))
    params = jax.jit(lambda: model.init({"params": rng, "mask": rng}, x, t, y))()
    # randomize zero-init layers so outputs are non-trivial
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim >= 2 else p, params
    )

    out_xla = jax.jit(lambda p: model.apply(p, x, t, y)["sample"])(params)

    flash_model = DiT(attention_impl="flash", **kw)  # interpret auto-on off-TPU
    out_pallas = jax.jit(lambda p: flash_model.apply(p, x, t, y)["sample"])(params)

    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=5e-5, atol=5e-5
    )


@pytest.mark.parametrize("tq,tk,h", [(256, 256, 8), (1024, 77, 16)])
def test_bh_variant_forward_matches_xla(tq, tk, h):
    """The DEFAULT dispatch variant ((B*H,T,D) whole-K kernel) vs XLA."""
    from micro_diffusion_tpu.ops.flash_attention_bh import flash_attention_bh

    b, d = 2, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(lambda q, k, v: flash_attention_bh(q, k, v, None, True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bh_variant_gradients_match_xla():
    from micro_diffusion_tpu.ops.flash_attention_bh import flash_attention_bh

    b, tq, tk, h, d = 2, 256, 256, 4, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_bh(q, k, v, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, d**-0.5)))

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("tq,tk,h", [(256, 256, 4), (128, 77, 16), (1024, 77, 16)])
def test_lane_variant_forward_matches_xla(tq, tk, h):
    """Lane-packed (B, T, H*D) kernel (two d=64 heads per program) vs XLA."""
    from micro_diffusion_tpu.ops.flash_attention_lane import (
        flash_attention_lane,
        supported,
    )

    b, d = 2, 64
    assert supported(h, d)
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(lambda q, k, v: flash_attention_lane(q, k, v, None, True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lane_variant_gradients_match_xla():
    from micro_diffusion_tpu.ops.flash_attention_lane import flash_attention_lane

    b, tq, tk, h, d = 2, 256, 77, 4, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_lane(q, k, v, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, d**-0.5)))

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


def test_lane_variant_odd_heads_unsupported():
    from micro_diffusion_tpu.ops.flash_attention_lane import supported

    assert not supported(3, 64)   # odd head count cannot pair
    assert not supported(4, 32)   # only d=64 fills the 128 lanes in pairs
