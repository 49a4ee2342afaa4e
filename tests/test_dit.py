"""DiT model tests: parameter-count parity with the reference torch implementation
(analytic expectations: MicroDiT_Tiny_2 = 200,692,752; MicroDiT_XL_2 = 1,165,442,320 -
matching the paper's 201M / 1.165B), forward shapes, masking, CFG, and init scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_diffusion_tpu.models.dit import (
    DiT,
    MicroDiT_Tiny_2,
    MicroDiT_XL_2,
    qkv_hidden_dim,
)

EXPECTED_TINY = 200_692_752
EXPECTED_XL = 1_165_442_320


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def micro_dit(**kw):
    """A small CPU-runnable DiT for functional tests."""
    defaults = dict(
        input_size=16,
        patch_size=2,
        in_channels=4,
        dim=64,
        depth=4,
        head_dim=16,
        multiple_of=32,
        caption_channels=32,
        qkv_multipliers=(0.5, 1.0),
        ffn_multipliers=(0.5, 4.0),
        use_patch_mixer=True,
        patch_mixer_depth=2,
        patch_mixer_dim=48,
        patch_mixer_qkv_ratio=1.0,
        patch_mixer_mlp_ratio=4.0,
        use_bias=False,
        num_experts=4,
        expert_capacity=2.0,
        experts_every_n=2,
        # fp32 compute: the CPU eager path cannot dispatch bf16 matmuls (DotThunk), and
        # fp32 keeps test numerics exact; bf16 is exercised under jit in the train tests.
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return DiT(**defaults)


def init_model(model, b=2, latent=16, cap_len=8, cap_dim=32):
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((b, model.in_channels, latent, latent))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 1, cap_len, cap_dim))
    # jit the init: eager per-op dispatch is pathologically slow in this environment
    # (every distinct-shape op round-trips a remote compile service)
    params = jax.jit(lambda: model.init({"params": rng, "mask": rng}, x, t, y))()
    return params, (x, t, y)


def run(model, params, x, t, y, mask_ratio=0.0, cfg=1.0, mask_rng=None):
    """Jitted model.apply (static mask_ratio/cfg)."""
    rng = mask_rng if mask_rng is not None else jax.random.PRNGKey(0)

    def f(params, x, t, y, rng):
        return model.apply(
            params, x, t, y, cfg=cfg, mask_ratio=mask_ratio, rngs={"mask": rng}
        )

    return jax.jit(f)(params, x, t, y, rng)


@pytest.mark.parametrize(
    "factory,expected",
    [(MicroDiT_Tiny_2, EXPECTED_TINY), (MicroDiT_XL_2, EXPECTED_XL)],
)
def test_param_count_parity(factory, expected):
    model = factory()
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, 4, 32, 32)),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, 77, 1024)),
        )
    )
    assert count_params(params) == expected


def test_qkv_hidden_dim_ladder():
    # reference dit.py:192-195: rounded to multiples of 2*head_dim; ==dim when ratio is 1
    assert qkv_hidden_dim(1024, 1.0, 64) == 1024
    qkv = np.linspace(0.5, 1.0, 28)
    dims = [qkv_hidden_dim(1024, r, 64) for r in qkv]
    assert dims[0] == 512 and dims[-1] == 1024
    assert all(d % 128 == 0 for d in dims)
    assert dims == sorted(dims)


def test_forward_shapes_no_mask():
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    out = run(model, params, x, t, y)
    assert out["sample"].shape == x.shape
    assert out["mask"] is None
    assert jnp.all(jnp.isfinite(out["sample"]))


def test_forward_shapes_masked():
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    out = run(model, params, x, t, y, mask_ratio=0.75, mask_rng=jax.random.PRNGKey(7))
    assert out["sample"].shape == x.shape
    mask = out["mask"]
    t_tokens = (16 // 2) ** 2
    assert mask.shape == (x.shape[0], t_tokens)
    # exactly 75% of tokens masked per sample
    np.testing.assert_array_equal(np.sum(np.asarray(mask), axis=1), 0.75 * t_tokens)


def test_masked_positions_are_zero():
    """Masked patches must come out as the zero mask token (reference dit.py:515-517)."""
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    # at init the final linear is zero (adaLN-zero), so randomize it to make kept
    # patches distinguishable from the zero mask token
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jax.random.normal(jax.random.PRNGKey(11), leaf.shape)
            if "final_layer" in str(path) and "kernel" in str(path)
            else leaf
        ),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    out = run(model, params, x, t, y, mask_ratio=0.75, mask_rng=jax.random.PRNGKey(7))
    sample = np.asarray(out["sample"])  # (B, C, H, W)
    mask = np.asarray(out["mask"])  # (B, T) 1 = masked
    b, c, h, w = sample.shape
    p = model.patch_size
    patches = sample.reshape(b, c, h // p, p, w // p, p).transpose(0, 2, 4, 1, 3, 5)
    patches = patches.reshape(b, (h // p) * (w // p), -1)
    masked = mask.astype(bool)
    assert np.all(patches[masked] == 0.0)
    assert not np.allclose(patches[~masked], 0.0)


def test_cfg_batching():
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    y = jax.random.normal(jax.random.PRNGKey(2), y.shape)
    out_cfg = run(model, params, x, t, y, cfg=5.0)
    assert out_cfg["sample"].shape == x.shape
    # cfg=1 equals plain forward
    def fwd(p, xx, tt, yy):
        return model.apply(p, xx, tt, yy)["sample"]
    fwd = jax.jit(fwd)
    cond = fwd(params, x, t, y)
    uncond = fwd(params, x, t, jnp.zeros_like(y))
    expected = uncond + 5.0 * (cond - uncond)
    np.testing.assert_allclose(
        np.asarray(out_cfg["sample"]), np.asarray(expected), rtol=1e-4, atol=1e-4
    )


def test_adaln_zero_init_identity():
    """With zero-init adaLN + final linear, the t-branch must not affect the output at
    init beyond the cross-attn path; final output is exactly zero (zero final linear)."""
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    out = run(model, params, x, t, y)["sample"]
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_init_statistics():
    # Same init scheme as the factories, at a CPU-cheap width; depth 16 so the
    # depth-scaled std of late blocks is testable.
    model = micro_dit(dim=256, depth=16, head_dim=32, caption_channels=64,
                      input_size=16, patch_mixer_dim=128)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, 4, 16, 16)),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, 8, 64)),
        )
    )()["params"]

    def get(path):
        node = params
        for k in path.split("/"):
            node = node[k]
        return np.asarray(node)

    # adaLN zero-init (dit.py:615-619)
    assert np.all(get("blocks_0/adaLN_modulation_1/kernel") == 0)
    assert np.all(get("final_layer/adaLN_modulation_1/kernel") == 0)
    assert np.all(get("final_layer/linear/kernel") == 0)
    # y_emb_preprocess output projections zero (dit.py:621-623)
    assert np.all(get("y_emb_preprocess/attn/proj/kernel") == 0)
    assert np.all(get("y_emb_preprocess/mlp/w3/kernel") == 0)
    # qkv std ~0.02 (utils.py:199-201)
    qkv = get("blocks_0/attn/qkv/kernel")
    assert abs(qkv.std() - 0.02) < 0.002
    # depth-scaled proj std (dit.py:227-230): layer 15 -> 0.02/sqrt(32)
    proj = get("blocks_15/attn/proj/kernel")
    assert abs(proj.std() - 0.02 / np.sqrt(32)) < 0.001
    # norm weights are ones
    assert np.all(get("blocks_0/norm1/weight") == 1.0)


def test_moe_placement():
    """MoE FFN every 2nd block, never the last backbone block (dit.py:410-418)."""
    model = MicroDiT_Tiny_2()
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, 4, 32, 32)),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, 77, 1024)),
        )
    )["params"]
    for i in range(16):
        is_moe = "gate" in params[f"blocks_{i}"]["mlp"]
        expected = (i + 1) % 2 == 0 and i != 15
        assert is_moe == expected, f"block {i}"
    # mixer: blocks 1 and 3 are MoE (dit.py:345-353 - no last-block exclusion)
    for i in range(4):
        is_moe = "gate" in params[f"patch_mixer_{i}"]["mlp"]
        assert is_moe == ((i + 1) % 2 == 0), f"mixer {i}"


def test_mask_determinism_and_rng():
    model = micro_dit()
    params, (x, t, y) = init_model(model)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    r = jax.random.PRNGKey(5)
    o1 = run(model, params, x, t, y, mask_ratio=0.75, mask_rng=r)
    o2 = run(model, params, x, t, y, mask_ratio=0.75, mask_rng=r)
    np.testing.assert_array_equal(np.asarray(o1["mask"]), np.asarray(o2["mask"]))
    o3 = run(model, params, x, t, y, mask_ratio=0.75, mask_rng=jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(o1["mask"]), np.asarray(o3["mask"]))


@pytest.mark.parametrize("policy", ["dots", "attn_moe", "dots_attn_moe", "dots_attn_moe_lean", "dots_attn_moe_xlean"])
def test_remat_policies_match_no_remat(policy):
    """Every remat policy (including the '_lean' MoE-hidden-recompute variants,
    needed to fit 512px mask-0 on one 16GB chip) is loss- and grad-identical to
    the unrematerialized model."""
    base = micro_dit()
    params, (x, t, y) = init_model(base)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    def make_loss(model):
        def loss(p):
            out = model.apply(p, x, t, y)
            return jnp.sum(jnp.sin(out["sample"]))
        return loss

    l0 = jax.jit(make_loss(base))(params)
    g0 = jax.jit(jax.grad(make_loss(base)))(params)
    rem = micro_dit(remat=True, remat_policy=policy)
    l1 = jax.jit(make_loss(rem))(params)
    g1 = jax.jit(jax.grad(make_loss(rem)))(params)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
