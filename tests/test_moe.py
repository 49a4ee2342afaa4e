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


def make_moe(dtype=jnp.float32, dispatch="onehot"):
    return FeedForwardECMoe(
        num_experts=4, expert_capacity=2.0, dim=32, hidden_dim=64, multiple_of=32,
        dtype=dtype, dispatch=dispatch,
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


@pytest.mark.parametrize("alt", ["scan", "batched", "hybrid", "onehot", "onehot_dots", "gather"])
def test_moe_dispatch_variants_match_unroll(alt):
    """All dispatch implementations (now static module attributes, not env vars)
    match the unrolled per-expert dots, forward and gradient. scan/unroll are
    bit-identical; the others differ only by fp32-accumulation association order."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    moe_u = make_moe(dispatch="unroll")
    params = jax.jit(lambda: moe_u.init(jax.random.PRNGKey(1), x))()
    params = jax.tree.map(lambda p: p * 10.0 if p.ndim >= 2 else p, params)

    def loss(moe):
        return lambda pr, xx: jnp.sum(jnp.sin(moe.apply(pr, xx)))

    y_unroll = jax.jit(moe_u.apply)(params, x)
    g_unroll = jax.jit(jax.grad(loss(moe_u)))(params, x)
    moe_a = make_moe(dispatch=alt)
    y_alt = jax.jit(moe_a.apply)(params, x)
    g_alt = jax.jit(jax.grad(loss(moe_a)))(params, x)

    np.testing.assert_allclose(
        np.asarray(y_unroll), np.asarray(y_alt), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(g_unroll), jax.tree.leaves(g_alt)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


# ------------------------------------------------------------ fused Pallas kernel


def _kernel_shapes():
    """Production-aligned shapes the kernel tiles (k % 16, d % 128, f % 256)."""
    n, e, k, d, f = 2, 8, 16, 128, 512
    rng = jax.random.PRNGKey(3)
    kx, k1, k2 = jax.random.split(rng, 3)
    xg = jax.random.normal(kx, (n, e, k, d), jnp.float32)
    w1 = jax.random.normal(k1, (e, d, f), jnp.float32) * 0.05
    w2 = jax.random.normal(k2, (e, f, d), jnp.float32) * 0.05
    return xg.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)


def test_moe_ffn_kernel_matches_xla():
    """Fused Pallas expert-FFN (interpret mode on CPU) == unrolled XLA dots,
    forward and all three gradients."""
    from micro_diffusion_tpu.ops.moe_ffn import _moe_ffn_ref, moe_ffn, supported

    xg, w1, w2 = _kernel_shapes()
    assert supported(xg.shape[0], xg.shape[1], xg.shape[2], xg.shape[3],
                     w1.shape[-1])

    y_k = jax.jit(lambda a, b, c: moe_ffn(a, b, c, interpret=True))(xg, w1, w2)
    y_r = jax.jit(_moe_ffn_ref)(xg, w1, w2)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )

    def loss(fn):
        return lambda a, b, c: jnp.sum(
            jnp.sin(fn(a, b, c).astype(jnp.float32))
        )

    g_k = jax.jit(jax.grad(
        loss(lambda a, b, c: moe_ffn(a, b, c, interpret=True)), argnums=(0, 1, 2)
    ))(xg, w1, w2)
    g_r = jax.jit(jax.grad(loss(_moe_ffn_ref), argnums=(0, 1, 2)))(xg, w1, w2)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_moe_ffn_kernel_split_bwd_matches_fused():
    """The fused dx+dw backward (whole row set resident, grid (e, fb)) and the
    split dx/dw kernels are numerically interchangeable. The split path only
    runs when the row set overflows VMEM, so force it with a tiny budget."""
    import micro_diffusion_tpu.ops.moe_ffn as mf

    xg, w1, w2 = _kernel_shapes()
    assert mf._fused_ft(xg.shape[0] * xg.shape[2], xg.shape[3], w1.shape[-1])

    def loss(a, b, c):
        return jnp.sum(jnp.sin(mf.moe_ffn(a, b, c, interpret=True).astype(
            jnp.float32)))

    g_fused = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xg, w1, w2)
    budget = mf._BUDGET
    try:
        mf._BUDGET = 256 * 1024  # force the split dx/dw path
        assert mf._fused_ft(
            xg.shape[0] * xg.shape[2], xg.shape[3], w1.shape[-1]) is None
        g_split = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xg, w1, w2)
    finally:
        mf._BUDGET = budget
    for a, b in zip(g_fused, g_split):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2,
        )


def test_moe_ffn_kernel_multi_tile():
    """Grid tiling correctness: multiple row blocks AND multiple f blocks."""
    from micro_diffusion_tpu.ops.moe_ffn import _moe_ffn_ref, moe_ffn

    n, e, k, d, f = 4, 2, 256, 128, 1024  # s=4 -> 1 row block? k=256 -> s=4; use n=8
    n = 8  # s = min(8, 1024//256) = 4 -> 2 row blocks; f/512 = 2 f blocks
    rng = jax.random.PRNGKey(4)
    kx, k1, k2 = jax.random.split(rng, 3)
    xg = (jax.random.normal(kx, (n, e, k, d)) * 0.5).astype(jnp.bfloat16)
    w1 = (jax.random.normal(k1, (e, d, f)) * 0.05).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (e, f, d)) * 0.05).astype(jnp.bfloat16)

    y_k = jax.jit(lambda a, b, c: moe_ffn(a, b, c, interpret=True))(xg, w1, w2)
    y_r = jax.jit(_moe_ffn_ref)(xg, w1, w2)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_moe_ffn_expert_major_kernel_matches_xla():
    """Expert-major (gather-layout) fused kernel == per-expert XLA dots, forward
    and all three gradients, at an on-grid shape (m % 16, d % 128, f % 256)."""
    from micro_diffusion_tpu.ops.moe_ffn import (
        _moe_ffn_em_ref,
        moe_ffn_expert_major,
    )

    e, m, d, f = 4, 96, 128, 512
    rng = jax.random.PRNGKey(5)
    kx, k1, k2 = jax.random.split(rng, 3)
    xg = (jax.random.normal(kx, (e, m, d)) * 0.5).astype(jnp.bfloat16)
    w1 = (jax.random.normal(k1, (e, d, f)) * 0.05).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (e, f, d)) * 0.05).astype(jnp.bfloat16)

    y_k = jax.jit(lambda a, b, c: moe_ffn_expert_major(a, b, c, interpret=True))(
        xg, w1, w2
    )
    y_r = jax.jit(_moe_ffn_em_ref)(xg, w1, w2)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )

    def loss(fn):
        return lambda a, b, c: jnp.sum(jnp.sin(fn(a, b, c).astype(jnp.float32)))

    g_k = jax.jit(jax.grad(
        loss(lambda a, b, c: moe_ffn_expert_major(a, b, c, interpret=True)),
        argnums=(0, 1, 2),
    ))(xg, w1, w2)
    g_r = jax.jit(jax.grad(loss(_moe_ffn_em_ref), argnums=(0, 1, 2)))(xg, w1, w2)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_moe_capacity_token_count():
    """Each expert processes exactly k = capacity * T / E tokens."""
    moe = make_moe()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32))
    params = jax.jit(lambda: moe.init(jax.random.PRNGKey(1), x))()
    # k = 2.0 * 16 / 4 = 8 tokens/expert; over 4 experts = 32 slots for 16 tokens
    out = jax.jit(moe.apply)(params, x)
    assert out.shape == x.shape


def test_dit_forward_grad_consistent_across_dispatch():
    """Full-model check: a small DiT's loss and param grads are equivalent under
    the hybrid and unroll dispatch modes (the custom-VJP adjoints are exact)."""
    from micro_diffusion_tpu.models.dit import DiT

    def build(dispatch):
        return DiT(
            input_size=16, patch_size=2, in_channels=4, dim=64, depth=2,
            head_dim=16, multiple_of=32, caption_channels=32,
            qkv_multipliers=(1.0,), ffn_multipliers=(2.0,),
            use_patch_mixer=True, patch_mixer_depth=1, patch_mixer_dim=48,
            use_bias=False, num_experts=4, expert_capacity=2.0,
            dtype=jnp.float32, moe_dispatch=dispatch,
        )

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.zeros((2,))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 32))

    ref_model = build("unroll")
    params = jax.jit(
        lambda: ref_model.init({"params": rng, "mask": rng}, x, t, y)
    )()

    outs = {}
    for mode in ("unroll", "hybrid"):
        model = build(mode)

        def loss(pr):
            out = model.apply(pr, x, t, y)
            return jnp.sum(jnp.sin(out["sample"]))

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        outs[mode] = (l, g)

    np.testing.assert_allclose(
        float(outs["hybrid"][0]), float(outs["unroll"][0]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(outs["unroll"][1]),
                    jax.tree.leaves(outs["hybrid"][1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_alean_remat_policy_matches_full():
    """'_alean' (attention projections emitted lean) must not change numerics:
    loss and grads equal the plain policy; only which activations remat saves
    differs."""
    from micro_diffusion_tpu.models.dit import DiT

    def build(policy):
        return DiT(
            input_size=16, patch_size=2, in_channels=4, dim=64, depth=2,
            head_dim=16, multiple_of=32, caption_channels=32,
            qkv_multipliers=(1.0,), ffn_multipliers=(2.0,),
            use_patch_mixer=True, patch_mixer_depth=1, patch_mixer_dim=48,
            use_bias=False, num_experts=4, expert_capacity=2.0,
            dtype=jnp.float32, remat=True, remat_policy=policy,
        )

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.zeros((2,))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 32))
    params = jax.jit(
        lambda: build("dots_attn_moe").init({"params": rng, "mask": rng}, x, t, y)
    )()

    outs = {}
    for policy in ("dots_attn_moe", "dots_attn_moe_xlean_alean"):
        model = build(policy)

        def loss(pr):
            return jnp.sum(jnp.sin(model.apply(pr, x, t, y)["sample"]))

        outs[policy] = jax.jit(jax.value_and_grad(loss))(params)

    a, b = outs["dots_attn_moe"], outs["dots_attn_moe_xlean_alean"]
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    for ga, gb in zip(jax.tree.leaves(a[1]), jax.tree.leaves(b[1])):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-6
        )
