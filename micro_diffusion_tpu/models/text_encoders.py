"""Frozen text encoders in JAX: CLIP text tower (OpenCLIP/HF layouts) and T5 encoder.

Capability parity with the reference UniversalTextEncoder / UniversalTokenizer
(utils.py:429-582): three backends -
  * "openclip:..." - CLIP text transformer that returns ALL 77 token embeddings after
    ln_final (NOT pooled), shaped (B, 1, 77, width) - the reference's custom forward
    (utils.py:485-494)
  * HF CLIPTextModel names (stabilityai/..., runwayml/...) - same math, HF weight naming
  * "DeepFloyd/t5-v1_1-xxl" - T5 encoder last_hidden_state, (B, 1, 120, 4096)

These run inference-only (frozen during training, reference model.py:97-98). Weights
load from LOCAL HuggingFace snapshot directories (zero-egress environment) via
``weights_dir``; numerics are validated against torch ``transformers`` implementations
in tests/test_text_encoders.py.
"""

import json
import math
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import text_encoder_embedding_format


# ======================================================================= CLIP


class CLIPTextTransformer(nn.Module):
    """CLIP text tower: token+pos embedding -> causal pre-LN transformer -> ln_final.

    Matches OpenCLIP's text branch / HF CLIPTextModel (quick-gelu or gelu per config).
    """

    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    context_length: int = 77
    use_quick_gelu: bool = False  # HF openai-clip uses quick_gelu; DFN5B uses gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        b, l = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            param_dtype=jnp.float32, name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            jax.nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = tok + pos[None, :l].astype(self.dtype)

        mask = jnp.triu(
            jnp.full((l, l), -jnp.inf, dtype=jnp.float32), k=1
        )  # causal

        act = (
            (lambda v: v * jax.nn.sigmoid(1.702 * v))
            if self.use_quick_gelu
            else (lambda v: nn.gelu(v, approximate=False))
        )
        head_dim = self.width // self.heads

        for i in range(self.layers):
            h = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_ln_1",
            )(x)
            qkv = nn.Dense(
                3 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_attn_in_proj",
            )(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, l, self.heads, head_dim)
            k = k.reshape(b, l, self.heads, head_dim)
            v = v.reshape(b, l, self.heads, head_dim)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (head_dim**-0.5)
            probs = jax.nn.softmax(logits + mask[None, None], axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v)
            attn = attn.reshape(b, l, self.width)
            attn = nn.Dense(
                self.width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_attn_out_proj",
            )(attn)
            x = x + attn

            h = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_ln_2",
            )(x)
            h = nn.Dense(
                4 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_mlp_c_fc",
            )(h)
            h = act(h)
            h = nn.Dense(
                self.width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"resblocks_{i}_mlp_c_proj",
            )(h)
            x = x + h

        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_final"
        )(x)
        return x  # (B, L, width) - all token embeddings, not pooled


def clip_torch_to_params(state_dict: Dict[str, Any], layers: int) -> Dict[str, Any]:
    """Convert an OpenCLIP text-tower or HF CLIPTextModel state dict to our params.

    OpenCLIP keys: token_embedding.weight, positional_embedding,
        transformer.resblocks.N.{ln_1,ln_2}.{weight,bias},
        .attn.{in_proj_weight,in_proj_bias,out_proj.weight,out_proj.bias},
        .mlp.{c_fc,c_proj}.{weight,bias}, ln_final.{weight,bias}
    HF keys: text_model.embeddings.token_embedding.weight,
        .position_embedding.weight, text_model.encoder.layers.N.
        {layer_norm1,layer_norm2}.{...}, .self_attn.{q,k,v,out}_proj.{...},
        .mlp.{fc1,fc2}.{...}, text_model.final_layer_norm.{...}
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def dense(dst, w, b=None):
        p[dst] = {"kernel": w.T} if b is None else {"kernel": w.T, "bias": b}

    def ln(dst, prefix, src):
        p[dst] = {"scale": src[f"{prefix}.weight"], "bias": src[f"{prefix}.bias"]}

    if "token_embedding.weight" in sd:  # OpenCLIP layout
        p["token_embedding"] = {"embedding": sd["token_embedding.weight"]}
        p["positional_embedding"] = sd["positional_embedding"]
        for i in range(layers):
            pre = f"transformer.resblocks.{i}"
            ln(f"resblocks_{i}_ln_1", f"{pre}.ln_1", sd)
            ln(f"resblocks_{i}_ln_2", f"{pre}.ln_2", sd)
            dense(
                f"resblocks_{i}_attn_in_proj",
                sd[f"{pre}.attn.in_proj_weight"],
                sd[f"{pre}.attn.in_proj_bias"],
            )
            dense(
                f"resblocks_{i}_attn_out_proj",
                sd[f"{pre}.attn.out_proj.weight"],
                sd[f"{pre}.attn.out_proj.bias"],
            )
            dense(f"resblocks_{i}_mlp_c_fc", sd[f"{pre}.mlp.c_fc.weight"],
                  sd[f"{pre}.mlp.c_fc.bias"])
            dense(f"resblocks_{i}_mlp_c_proj", sd[f"{pre}.mlp.c_proj.weight"],
                  sd[f"{pre}.mlp.c_proj.bias"])
        ln("ln_final", "ln_final", sd)
    else:  # HF CLIPTextModel layout
        pre0 = "text_model."
        p["token_embedding"] = {
            "embedding": sd[f"{pre0}embeddings.token_embedding.weight"]
        }
        p["positional_embedding"] = sd[
            f"{pre0}embeddings.position_embedding.weight"
        ]
        for i in range(layers):
            pre = f"{pre0}encoder.layers.{i}"
            ln(f"resblocks_{i}_ln_1", f"{pre}.layer_norm1", sd)
            ln(f"resblocks_{i}_ln_2", f"{pre}.layer_norm2", sd)
            qw = sd[f"{pre}.self_attn.q_proj.weight"]
            kw = sd[f"{pre}.self_attn.k_proj.weight"]
            vw = sd[f"{pre}.self_attn.v_proj.weight"]
            qb = sd[f"{pre}.self_attn.q_proj.bias"]
            kb = sd[f"{pre}.self_attn.k_proj.bias"]
            vb = sd[f"{pre}.self_attn.v_proj.bias"]
            dense(
                f"resblocks_{i}_attn_in_proj",
                np.concatenate([qw, kw, vw], axis=0),
                np.concatenate([qb, kb, vb], axis=0),
            )
            dense(
                f"resblocks_{i}_attn_out_proj",
                sd[f"{pre}.self_attn.out_proj.weight"],
                sd[f"{pre}.self_attn.out_proj.bias"],
            )
            dense(f"resblocks_{i}_mlp_c_fc", sd[f"{pre}.mlp.fc1.weight"],
                  sd[f"{pre}.mlp.fc1.bias"])
            dense(f"resblocks_{i}_mlp_c_proj", sd[f"{pre}.mlp.fc2.weight"],
                  sd[f"{pre}.mlp.fc2.bias"])
        ln("ln_final", f"{pre0}final_layer_norm", sd)
    return {"params": p}


# ======================================================================= T5


class T5Encoder(nn.Module):
    """T5 v1.1 encoder stack: relative-position-bias attention + gated-GELU FF,
    RMSNorm, final layer norm (DeepFloyd/t5-v1_1-xxl: d_model 4096, 24 layers,
    64 heads, d_ff 10240, d_kv 64)."""

    vocab_size: int = 32128
    d_model: int = 4096
    num_layers: int = 24
    num_heads: int = 64
    d_kv: int = 64
    d_ff: int = 10240
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def _relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
        # bidirectional (encoder) bucketing, matching HF T5
        num_buckets //= 2
        ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rel_pos)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(n.astype(jnp.float32) / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, num_buckets - 1)
        return ret + jnp.where(is_small, n, val_large)

    def _rms(self, x, name):
        scale = self.param(name, jax.nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        b, l = input_ids.shape
        x = nn.Embed(
            self.vocab_size, self.d_model, dtype=self.dtype,
            param_dtype=jnp.float32, name="shared",
        )(input_ids)

        if attention_mask is None:
            attention_mask = jnp.ones((b, l), jnp.int32)
        ext_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

        # relative position bias (first layer's table, shared across layers)
        ctx = jnp.arange(l)[:, None]
        mem = jnp.arange(l)[None, :]
        buckets = self._relative_position_bucket(
            mem - ctx, self.rel_buckets, self.rel_max_distance
        )
        rel_table = self.param(
            "relative_attention_bias",
            jax.nn.initializers.normal(1.0),
            (self.rel_buckets, self.num_heads),
            jnp.float32,
        )
        pos_bias = jnp.transpose(rel_table[buckets], (2, 0, 1))[None]  # (1,H,L,L)

        inner = self.num_heads * self.d_kv
        for i in range(self.num_layers):
            h = self._rms(x, f"layers_{i}_ln_0")
            dense = lambda f, name: nn.Dense(
                f, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )
            q = dense(inner, f"layers_{i}_q")(h).reshape(b, l, self.num_heads,
                                                         self.d_kv)
            k = dense(inner, f"layers_{i}_k")(h).reshape(b, l, self.num_heads,
                                                         self.d_kv)
            v = dense(inner, f"layers_{i}_v")(h).reshape(b, l, self.num_heads,
                                                         self.d_kv)
            # NOTE: T5 does NOT scale by sqrt(d_kv)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            logits = logits + pos_bias + ext_mask
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, inner)
            x = x + dense(self.d_model, f"layers_{i}_o")(attn)

            h = self._rms(x, f"layers_{i}_ln_1")
            wi0 = dense(self.d_ff, f"layers_{i}_wi_0")(h)
            wi1 = dense(self.d_ff, f"layers_{i}_wi_1")(h)
            h = nn.gelu(wi0, approximate=True) * wi1
            x = x + dense(self.d_model, f"layers_{i}_wo")(h)

        return self._rms(x, "final_layer_norm")


def t5_torch_to_params(state_dict: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Convert an HF T5EncoderModel state dict to our T5Encoder params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {}
    p["shared"] = {"embedding": sd["shared.weight"]}
    pre = "encoder."
    p["relative_attention_bias"] = sd[
        f"{pre}block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ]
    for i in range(num_layers):
        blk = f"{pre}block.{i}.layer"
        p[f"layers_{i}_ln_0"] = sd[f"{blk}.0.layer_norm.weight"]
        for name, src in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "o")):
            p[f"layers_{i}_{name}"] = {
                "kernel": sd[f"{blk}.0.SelfAttention.{src}.weight"].T
            }
        p[f"layers_{i}_ln_1"] = sd[f"{blk}.1.layer_norm.weight"]
        p[f"layers_{i}_wi_0"] = {"kernel": sd[f"{blk}.1.DenseReluDense.wi_0.weight"].T}
        p[f"layers_{i}_wi_1"] = {"kernel": sd[f"{blk}.1.DenseReluDense.wi_1.weight"].T}
        p[f"layers_{i}_wo"] = {"kernel": sd[f"{blk}.1.DenseReluDense.wo.weight"].T}
    p["final_layer_norm"] = sd[f"{pre}final_layer_norm.weight"]
    return {"params": p}


# ============================================================ universal wrappers


def _np(v) -> np.ndarray:
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v, np.float32)


_CLIP_CONFIGS = {
    # name -> (vocab, width, layers, heads, quick_gelu)
    "openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378": (49408, 1024, 24, 16, False),
    "stabilityai/stable-diffusion-2-base": (49408, 1024, 23, 16, False),
    "runwayml/stable-diffusion-v1-5": (49408, 768, 12, 12, True),
    "CompVis/stable-diffusion-v1-4": (49408, 768, 12, 12, True),
}


class UniversalTextEncoder:
    """Reference-parity universal encoder (utils.py:429-469): encode(tokenized, mask)
    -> (embeddings, None) with CLIP-style (B, 1, 77, 1024) or T5 (B, 1, 120, 4096)."""

    def __init__(
        self,
        name: str,
        dtype: str = "bfloat16",
        pretrained: bool = True,
        weights_dir: Optional[str] = None,
        params: Optional[Dict] = None,
    ):
        self.name = name
        jdtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
                  "float32": jnp.float32}[dtype]
        self.is_t5 = name == "DeepFloyd/t5-v1_1-xxl"
        if self.is_t5:
            self.module = T5Encoder(dtype=jdtype)
        else:
            if name in _CLIP_CONFIGS:
                vocab, width, layers, heads, qg = _CLIP_CONFIGS[name]
            else:
                # Local HF CLIPTextModel snapshot: architecture from config.json
                # (reference utils.py:465-469 accepts any HF name; offline that
                # means a local directory).
                cfg_dir = name if os.path.isdir(name) else (weights_dir or "")
                cfg_path = os.path.join(cfg_dir, "config.json")
                if not os.path.exists(cfg_path):
                    raise KeyError(
                        f"unknown text encoder '{name}' and no local config.json"
                    )
                with open(cfg_path) as f:
                    cfg = json.load(f)
                vocab = int(cfg["vocab_size"])
                width = int(cfg["hidden_size"])
                layers = int(cfg["num_hidden_layers"])
                heads = int(cfg["num_attention_heads"])
                qg = cfg.get("hidden_act", "quick_gelu") == "quick_gelu"
                if os.path.isdir(name) and weights_dir is None:
                    weights_dir = name
            self.module = CLIPTextTransformer(
                vocab_size=vocab, width=width, layers=layers, heads=heads,
                use_quick_gelu=qg, dtype=jdtype,
            )
        self.params = params
        if self.params is None and pretrained:
            if weights_dir is None:
                raise FileNotFoundError(
                    f"no local weights for text encoder '{name}': pass weights_dir "
                    "pointing at a local HF snapshot (zero-egress environment), or "
                    "params= directly"
                )
            self.params = load_encoder_params_from_dir(self, weights_dir)
        self._jit_encode = jax.jit(self.module.apply)

    def encode(
        self, tokenized_caption, attention_mask=None
    ) -> Tuple[jax.Array, None]:
        ids = jnp.asarray(tokenized_caption)
        if self.is_t5:
            out = self._jit_encode(
                self.params, ids,
                jnp.asarray(attention_mask) if attention_mask is not None else None,
            )
        else:
            out = self._jit_encode(self.params, ids)
        return out[:, None], None  # (B, 1, L, D)


def load_encoder_params_from_dir(enc: UniversalTextEncoder, weights_dir: str):
    """Load params from a local HF snapshot dir (safetensors or pytorch .bin)."""
    sd = load_state_dict_from_dir(weights_dir)
    if enc.is_t5:
        return t5_torch_to_params(sd, enc.module.num_layers)
    return clip_torch_to_params(sd, enc.module.layers)


def load_state_dict_from_dir(weights_dir: str) -> Dict[str, np.ndarray]:
    files = sorted(os.listdir(weights_dir))
    st = [f for f in files if f.endswith(".safetensors")]
    if st:
        from safetensors.numpy import load_file

        sd: Dict[str, np.ndarray] = {}
        for f in st:
            sd.update(load_file(os.path.join(weights_dir, f)))
        return sd
    bins = [f for f in files if f.endswith((".bin", ".pt", ".pth"))]
    if bins:
        import torch

        sd = {}
        for f in bins:
            sd.update(
                torch.load(os.path.join(weights_dir, f), map_location="cpu",
                           weights_only=True)
            )
        return sd
    raise FileNotFoundError(f"no weight files in {weights_dir}")


class UniversalTokenizer:
    """Reference-parity tokenizer wrapper (utils.py:537-582).

    Loads from a local tokenizer directory (HF format). CLIP-style: pad-to-77, no
    attention mask; T5: pad-to-120 with attention mask (requires sentencepiece).
    """

    def __init__(self, name: str, tokenizer_dir: Optional[str] = None):
        self.name = name
        s, _ = text_encoder_embedding_format(name)
        self.model_max_length = s
        self._tok = None
        self._tokenizer_dir = tokenizer_dir

    def _ensure(self):
        if self._tok is not None:
            return
        if self._tokenizer_dir is None:
            raise FileNotFoundError(
                f"tokenizer for '{self.name}' requires a local vocab: pass "
                "tokenizer_dir with an HF tokenizer snapshot (zero-egress environment)"
            )
        if self.name == "DeepFloyd/t5-v1_1-xxl":
            self._tok = self._load_t5_tokenizer(self._tokenizer_dir)
        else:
            from transformers import CLIPTokenizer

            self._tok = CLIPTokenizer.from_pretrained(self._tokenizer_dir)

    @staticmethod
    def _load_t5_tokenizer(tokenizer_dir: str):
        """T5 tokenizer fallback chain (this image has no ``sentencepiece``):
        1. T5TokenizerFast - works when the snapshot ships tokenizer.json
           (rust ``tokenizers`` is installed);
        2. first-party unigram reader over spiece.model (utils/spm.py)."""
        import os

        if os.path.exists(os.path.join(tokenizer_dir, "tokenizer.json")):
            try:
                from transformers import T5TokenizerFast

                return T5TokenizerFast.from_pretrained(tokenizer_dir)
            except Exception:
                pass
        spiece = os.path.join(tokenizer_dir, "spiece.model")
        if os.path.exists(spiece):
            from ..utils.spm import T5SpmTokenizer

            return T5SpmTokenizer(spiece)
        raise FileNotFoundError(
            f"no T5 tokenizer assets in {tokenizer_dir}: need tokenizer.json "
            "(fast path) or spiece.model (first-party unigram reader)"
        )

    def tokenize(self, captions) -> Dict[str, np.ndarray]:
        self._ensure()
        if self.name == "DeepFloyd/t5-v1_1-xxl":
            out = self._tok(
                captions, padding="max_length", max_length=self.model_max_length,
                truncation=True, return_attention_mask=True,
                add_special_tokens=True, return_tensors="np",
            )
            return {"input_ids": out["input_ids"],
                    "attention_mask": out["attention_mask"]}
        out = self._tok(
            captions, padding="max_length", max_length=self.model_max_length,
            truncation=True, return_tensors="np",
        )
        return {"input_ids": out["input_ids"]}
