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
    "tq,tk",
    [(64, 64), (256, 77), (128, 128)],
)
def test_forward_matches_xla(tq, tk):
    b, h, d = 2, 4, 64
    q, k, v = rand((b, tq, h, d), 0), rand((b, tk, h, d), 1), rand((b, tk, h, d), 2)
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, None, True)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


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
