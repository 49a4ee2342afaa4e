"""Fused adaLN (LayerNorm + modulate) Pallas kernel vs the unfused reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_diffusion_tpu.ops.adaln import _reference, layernorm_modulate


@pytest.mark.parametrize("use_weight", [True, False])
def test_forward_matches_reference(use_weight):
    b, t, d = 3, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    w = jax.random.normal(jax.random.PRNGKey(1), (d,)) if use_weight else None
    shift = jax.random.normal(jax.random.PRNGKey(2), (b, d))
    scale = jax.random.normal(jax.random.PRNGKey(3), (b, d))
    ref = _reference(x, w, shift, scale, 1e-6)
    out = jax.jit(
        lambda x, w, s1, s2: layernorm_modulate(x, w, s1, s2, 1e-6, True)
    )(x, w, shift, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    b, t, d = 2, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    w = jax.random.normal(jax.random.PRNGKey(1), (d,))
    shift = jax.random.normal(jax.random.PRNGKey(2), (b, d))
    scale = jax.random.normal(jax.random.PRNGKey(3), (b, d))

    def loss_fused(x, w, s1, s2):
        return jnp.sum(jnp.sin(layernorm_modulate(x, w, s1, s2, 1e-6, True)))

    def loss_ref(x, w, s1, s2):
        return jnp.sum(jnp.sin(_reference(x, w, s1, s2, 1e-6)))

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(x, w, shift, scale)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(x, w, shift, scale)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_full_dit_forward_fused_vs_unfused(monkeypatch):
    """fused_adaln=True (interpret mode) must match the unfused model forward."""
    from micro_diffusion_tpu.models.dit import DiT

    kwargs = dict(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=2, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(1.0,),
        ffn_multipliers=(2.0,), use_patch_mixer=True, patch_mixer_depth=1,
        patch_mixer_dim=64, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    model = DiT(**kwargs)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 16, 16))
    t = jnp.full((2,), 0.4)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 32))
    params = jax.jit(lambda: model.init({"params": rng, "mask": rng}, x, t, y))()
    params = jax.tree.map(lambda p: p + 0.01 if p.ndim >= 2 else p, params)

    ref = jax.jit(lambda p: model.apply(p, x, t, y)["sample"])(params)
    # fused_adaln is a static config field (NOT an env var) - same param tree,
    # different compute path; interpret mode keeps the Pallas kernel CPU-runnable
    fused_model = DiT(fused_adaln=True, **kwargs)
    monkeypatch.setenv("MDT_ATTENTION_INTERPRET", "1")
    fused = jax.jit(lambda p: fused_model.apply(p, x, t, y)["sample"])(params)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=5e-5, atol=5e-5
    )
