"""Text encoder numerics: our JAX CLIP text tower and T5 encoder vs the installed torch
transformers implementations, with randomly initialized weights converted through our
state-dict converters. This validates both the architecture and the weight mapping, so
real released weights load correctly (no network in this environment)."""

import numpy as np
import pytest
import torch

from micro_diffusion_tpu.models.text_encoders import (
    CLIPTextTransformer,
    T5Encoder,
    clip_torch_to_params,
    t5_torch_to_params,
)

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_clip_matches_hf_transformers(quick_gelu):
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu" if quick_gelu else "gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(cfg).eval()

    ids = np.array([[1, 5, 7, 20, 3, 9, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                    [4, 8, 15, 16, 23, 42, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        # last_hidden_state WITHOUT pooling, causal mask (CLIP text default)
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    ours = CLIPTextTransformer(
        vocab_size=99, width=64, layers=3, heads=4, context_length=16,
        use_quick_gelu=quick_gelu, dtype=jnp.float32,
    )
    params = clip_torch_to_params(hf.state_dict(), layers=3)
    out = jax.jit(ours.apply)(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_clip_openclip_layout_conversion():
    """OpenCLIP-layout state dict (fused in_proj) converts and matches the HF-layout
    conversion of the same weights."""
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=50, hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=8, hidden_act="gelu",
    )
    torch.manual_seed(1)
    hf = CLIPTextModel(cfg).eval()
    sd = hf.state_dict()

    # build the OpenCLIP-layout dict from the HF weights
    oc = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
    }
    for i in range(2):
        pre = f"text_model.encoder.layers.{i}"
        dst = f"transformer.resblocks.{i}"
        oc[f"{dst}.ln_1.weight"] = sd[f"{pre}.layer_norm1.weight"]
        oc[f"{dst}.ln_1.bias"] = sd[f"{pre}.layer_norm1.bias"]
        oc[f"{dst}.ln_2.weight"] = sd[f"{pre}.layer_norm2.weight"]
        oc[f"{dst}.ln_2.bias"] = sd[f"{pre}.layer_norm2.bias"]
        oc[f"{dst}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{pre}.self_attn.{x}_proj.weight"] for x in "qkv"], dim=0
        )
        oc[f"{dst}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{pre}.self_attn.{x}_proj.bias"] for x in "qkv"], dim=0
        )
        oc[f"{dst}.attn.out_proj.weight"] = sd[f"{pre}.self_attn.out_proj.weight"]
        oc[f"{dst}.attn.out_proj.bias"] = sd[f"{pre}.self_attn.out_proj.bias"]
        oc[f"{dst}.mlp.c_fc.weight"] = sd[f"{pre}.mlp.fc1.weight"]
        oc[f"{dst}.mlp.c_fc.bias"] = sd[f"{pre}.mlp.fc1.bias"]
        oc[f"{dst}.mlp.c_proj.weight"] = sd[f"{pre}.mlp.fc2.weight"]
        oc[f"{dst}.mlp.c_proj.bias"] = sd[f"{pre}.mlp.fc2.bias"]

    p_hf = clip_torch_to_params(sd, layers=2)
    p_oc = clip_torch_to_params(oc, layers=2)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(p_hf)[0], key=lambda x: str(x[0])),
        sorted(jax.tree_util.tree_flatten_with_path(p_oc)[0], key=lambda x: str(x[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(va, vb)


def test_t5_matches_hf_transformers():
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=120,
        d_model=48,
        d_kv=12,
        d_ff=96,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(cfg).eval()

    ids = np.array([[3, 7, 12, 99, 5, 1, 0, 0], [8, 14, 2, 1, 0, 0, 0, 0]])
    mask = (ids != 0).astype(np.int32)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    ours = T5Encoder(
        vocab_size=120, d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
        rel_buckets=8, rel_max_distance=20, dtype=jnp.float32,
    )
    params = t5_torch_to_params(hf.state_dict(), num_layers=2)
    out = jax.jit(ours.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)
