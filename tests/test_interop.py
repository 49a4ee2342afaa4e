"""Torch checkpoint interop: name-mapping fidelity + round-trip conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from micro_diffusion_tpu.models.dit import DiT
from micro_diffusion_tpu.models.interop import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
    validate_params_match,
    _strip_prefixes,
)


def micro_dit():
    return DiT(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(0.5, 1.0),
        ffn_multipliers=(0.5, 4.0), use_patch_mixer=True, patch_mixer_depth=2,
        patch_mixer_dim=48, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )


def init_params(model):
    rng = jax.random.PRNGKey(0)
    return jax.jit(
        lambda: model.init(
            {"params": rng, "mask": rng},
            jnp.zeros((1, 4, 16, 16)),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, 8, 32)),
        )
    )()


def test_round_trip():
    model = micro_dit()
    params = init_params(model)
    sd = params_to_torch_state_dict(params)
    back = {"params": torch_state_dict_to_params(sd)}
    validate_params_match(back, params)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda x: str(x[0])),
        sorted(jax.tree_util.tree_flatten_with_path(back)[0], key=lambda x: str(x[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_torch_key_names():
    """Converted key names must match the reference torch module naming exactly
    (reference dit.py attribute structure)."""
    model = micro_dit()
    params = init_params(model)
    sd = params_to_torch_state_dict(params)
    keys = set(sd)
    expected_subset = {
        "x_embedder.proj.weight",
        "x_embedder.proj.bias",
        "t_embedder.mlp.0.weight",
        "t_embedder.mlp.0.bias",
        "t_embedder.mlp.2.weight",
        "y_embedder.y_proj.fc1.weight",
        "y_embedder.y_proj.fc1.bias",
        "y_embedder.y_proj.norm.weight",
        "y_embedder.y_proj.fc2.weight",
        "y_emb_preprocess.norm1.weight",
        "y_emb_preprocess.attn.qkv.weight",
        "y_emb_preprocess.attn.proj.weight",
        "y_emb_preprocess.norm2.weight",
        "y_emb_preprocess.mlp.w1.weight",
        "y_emb_preprocess.mlp.w3.weight",
        "pooled_y_emb_process.fc1.weight",
        "pooled_y_emb_process.norm.weight",
        "pooled_y_emb_process.fc2.weight",
        "patch_mixer_map_xin.0.weight",
        "patch_mixer_map_xin.1.weight",
        "patch_mixer_map_xout.0.weight",
        "patch_mixer_map_xout.1.weight",
        "patch_mixer_map_y.0.weight",
        "patch_mixer_map_y.1.weight",
        "patch_mixer.0.norm1.weight",
        "patch_mixer.0.attn.qkv.weight",
        "patch_mixer.0.cross_attn.q_linear.weight",
        "patch_mixer.0.cross_attn.kv_linear.weight",
        "patch_mixer.0.cross_attn.proj.weight",
        "patch_mixer.0.mlp.w1.weight",
        "patch_mixer.0.adaLN_modulation.1.weight",
        "patch_mixer.0.adaLN_modulation.1.bias",
        "patch_mixer.1.mlp.w1",  # MoE raw parameter (3-D)
        "patch_mixer.1.mlp.w2",
        "patch_mixer.1.mlp.gate.weight",
        "blocks.0.norm1.weight",
        "blocks.0.attn.qkv.weight",
        "blocks.0.attn.proj.weight",
        "blocks.0.mlp.w1.weight",
        "blocks.1.mlp.w1",  # block 1 is MoE
        "blocks.1.mlp.gate.weight",
        "blocks.3.mlp.w1.weight",  # last block never MoE
        "blocks.0.adaLN_modulation.1.weight",
        "final_layer.linear.weight",
        "final_layer.linear.bias",
        "final_layer.adaLN_modulation.1.weight",
        "final_layer.norm_final.weight",
    }
    missing = expected_subset - keys
    assert not missing, f"missing torch keys: {sorted(missing)}"
    # shapes: torch linear is (out, in)
    assert sd["t_embedder.mlp.0.weight"].shape == (64, 512)
    assert sd["x_embedder.proj.weight"].shape == (64, 4, 2, 2)
    assert sd["blocks.1.mlp.w1"].ndim == 3  # (e, d, f)
    # no bias keys for use_bias=False linears
    assert "blocks.0.attn.qkv.bias" not in keys
    assert "blocks.0.adaLN_modulation.1.bias" in keys  # adaLN bias always present


def test_forward_equivalence_after_round_trip():
    model = micro_dit()
    params = init_params(model)
    # perturb so outputs are non-zero
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape).astype(
            np.float32
        ),
        params,
    )
    back = {"params": torch_state_dict_to_params(params_to_torch_state_dict(params))}
    back = jax.tree.map(jnp.asarray, back)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.zeros((2,))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 32))
    f = jax.jit(lambda p: model.apply(p, x, t, y)["sample"])
    np.testing.assert_allclose(
        np.asarray(f(params)), np.asarray(f(back)), rtol=1e-6, atol=1e-6
    )


def test_strip_composer_prefixes():
    sd = {
        "state": {
            "model": {
                "dit.blocks.0.norm1.weight": np.ones(4),
                "dit.pos_embed": np.zeros((1, 64, 8)),
            }
        }
    }
    out = _strip_prefixes(sd)
    assert "blocks.0.norm1.weight" in out
    assert "pos_embed" in out


def test_load_any_checkpoint_orbax(tmp_path):
    """load_any_checkpoint reads our Trainer's orbax layout and prefers EMA params."""
    import orbax.checkpoint as ocp

    from micro_diffusion_tpu.models.interop import load_any_checkpoint

    state = {
        "step": np.asarray(7),
        "params": {"params": {"w": np.ones((2, 2), np.float32)}},
        "opt_state": {"count": np.asarray(7)},
        "ema_params": {"params": {"w": np.full((2, 2), 3.0, np.float32)}},
    }
    mgr = ocp.CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(7, args=ocp.args.Composite(state=ocp.args.StandardSave(state)))
    mgr.wait_until_finished()
    params = load_any_checkpoint(str(tmp_path / "ckpts"))
    np.testing.assert_array_equal(np.asarray(params["params"]["w"]), 3.0)  # EMA wins
