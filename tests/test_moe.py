"""FeedForwardECMoe: equivalence of the gather/scatter-add dispatch with the reference's
dense one-hot einsum formulation (reference dit.py:126-143), including gradients through
the gate probabilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_diffusion_tpu.models.layers import FeedForwardECMoe


def reference_onehot_forward(params, x, num_experts, expert_capacity, hidden):
    """Straight port of the reference math: one-hot dispatch/combine einsums."""
    n, t, d = x.shape
    e = num_experts
    k = int(expert_capacity * t / e)
    gate_w = params["gate"]["kernel"]  # (d, e)
    w1 = params["w1"]  # (e, d, f)
    w2 = params["w2"]  # (e, f, d)

    scores = x @ gate_w  # (n, t, e)
    probs = jax.nn.softmax(scores, axis=-1)
    g, m = jax.lax.top_k(jnp.swapaxes(probs, 1, 2), k)  # (n, e, k)
    p = jax.nn.one_hot(m, t, dtype=x.dtype)  # (n, e, k, t)

    xin = jnp.einsum("nekt,ntd->nekd", p, x)
    h = jnp.einsum("nekd,edf->nekf", xin, w1)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("nekf,efd->nekd", h, w2)
    out = g[..., None] * h
    return jnp.einsum("nekt,nekd->ntd", p, out)


def make_moe(dtype=jnp.float32):
    return FeedForwardECMoe(
        num_experts=4, expert_capacity=2.0, dim=32, hidden_dim=64, multiple_of=32,
        dtype=dtype,
    )


def test_moe_matches_onehot_einsum():
    moe = make_moe()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    params = jax.jit(lambda: moe.init(jax.random.PRNGKey(1), x))()
    # randomize weights (init is ~0.02 std; scale up to make mismatches visible)
    params = jax.tree.map(
        lambda p: p * 10.0 if p.ndim >= 2 else p, params
    )
    ours = jax.jit(moe.apply)(params, x)
    ref = jax.jit(
        lambda pr, xx: reference_onehot_forward(pr["params"], xx, 4, 2.0, 64)
    )(params, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_moe_gradients_match_onehot():
    """Gradient flows through the gate probs (g * h term) identically in both forms."""
    moe = make_moe()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    params = jax.jit(lambda: moe.init(jax.random.PRNGKey(1), x))()
    params = jax.tree.map(lambda p: p * 10.0 if p.ndim >= 2 else p, params)

    def loss_ours(pr, xx):
        return jnp.sum(jnp.sin(moe.apply(pr, xx)))

    def loss_ref(pr, xx):
        return jnp.sum(jnp.sin(reference_onehot_forward(pr["params"], xx, 4, 2.0, 64)))

    g_ours = jax.jit(jax.grad(loss_ours))(params, x)
    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    for a, b in zip(jax.tree.leaves(g_ours), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("alt", ["scan", "batched"])
def test_moe_dispatch_variants_match_unroll(monkeypatch, alt):
    """MDT_MOE_DISPATCH=scan (lax.map over experts) and =batched (3-D einsum,
    lowest-peak-HBM update graph) match the default unrolled per-expert dots,
    forward and gradient. scan/unroll are bit-identical; batched differs only by
    fp32-accumulation association order."""
    moe = make_moe()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    params = jax.jit(lambda: moe.init(jax.random.PRNGKey(1), x))()
    params = jax.tree.map(lambda p: p * 10.0 if p.ndim >= 2 else p, params)

    def loss(pr, xx):
        return jnp.sum(jnp.sin(moe.apply(pr, xx)))

    monkeypatch.setenv("MDT_MOE_DISPATCH", "unroll")
    y_unroll = jax.jit(moe.apply)(params, x)
    g_unroll = jax.jit(jax.grad(loss))(params, x)
    monkeypatch.setenv("MDT_MOE_DISPATCH", alt)
    y_alt = jax.jit(moe.apply)(params, x)
    g_alt = jax.jit(jax.grad(loss))(params, x)

    np.testing.assert_allclose(
        np.asarray(y_unroll), np.asarray(y_alt), rtol=1e-6, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(g_unroll), jax.tree.leaves(g_alt)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_moe_capacity_token_count():
    """Each expert processes exactly k = capacity * T / E tokens."""
    moe = make_moe()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32))
    params = jax.jit(lambda: moe.init(jax.random.PRNGKey(1), x))()
    # k = 2.0 * 16 / 4 = 8 tokens/expert; over 4 experts = 32 slots for 16 tokens
    out = jax.jit(moe.apply)(params, x)
    assert out.shape == x.shape
