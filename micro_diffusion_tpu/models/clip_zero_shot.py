"""CLIP zero-shot classification (vision tower + similarity head), JAX-native.

Upstream GenEval (Ghosh et al. 2023) judges the *color* of each detected object
by CLIP zero-shot classification on the detection crop. The reference repo
reports GenEval scores produced that way (reference README.md:56-61); this
module supplies the missing piece so our GenEval harness scores colors the
official way instead of the hue heuristic.

Loads a standard HF CLIPModel snapshot directory (config.json +
pytorch_model.bin / model.safetensors with ``vision_model.`` / ``text_model.``
prefixes + the two projection heads). The text tower reuses
``text_encoders.CLIPTextTransformer``; numerics of the vision tower are
validated against ``transformers.CLIPModel`` in tests/test_clip_zero_shot.py.
"""

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .text_encoders import (
    CLIPTextTransformer,
    clip_torch_to_params,
    load_state_dict_from_dir,
)

# CLIP preprocessing constants (OpenAI CLIP / HF CLIPImageProcessor defaults)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionTransformer(nn.Module):
    """HF ``CLIPVisionModel`` semantics: conv patchify + CLS token + learned pos
    embedding -> pre-LN transformer -> post-LN pooled CLS embedding."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    use_quick_gelu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (B, H, W, 3) normalized. Returns pooled (B, width)."""
        b = pixels.shape[0]
        patches = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embedding",
        )(pixels.astype(self.dtype))
        patches = patches.reshape(b, -1, self.width)  # (B, T, W) row-major grid
        t = patches.shape[1]

        cls = self.param(
            "class_embedding", jax.nn.initializers.normal(0.02),
            (self.width,), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), patches],
            axis=1,
        )
        pos = self.param(
            "position_embedding", jax.nn.initializers.normal(0.02),
            (t + 1, self.width), jnp.float32,
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="pre_layernorm",
        )(x)

        act = (
            (lambda v: v * jax.nn.sigmoid(1.702 * v))
            if self.use_quick_gelu
            else (lambda v: nn.gelu(v, approximate=False))
        )
        head_dim = self.width // self.heads
        l = t + 1
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
            probs = jax.nn.softmax(logits, axis=-1)  # non-causal
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

        pooled = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="post_layernorm",
        )(x[:, 0])
        return pooled  # (B, width)


def clip_vision_torch_to_params(
    state_dict: Dict[str, Any], layers: int
) -> Dict[str, Any]:
    """HF ``CLIPVisionModel``/``CLIPModel`` vision keys -> CLIPVisionTransformer
    params. HF conv weight is (out, in, kh, kw); flax wants (kh, kw, in, out).
    NOTE: HF's attribute is literally spelled ``pre_layrnorm``."""

    def _np(v):
        try:
            import torch

            if isinstance(v, torch.Tensor):
                return v.detach().cpu().float().numpy()
        except ImportError:
            pass
        return np.asarray(v, np.float32)

    sd = {k.removeprefix("vision_model."): _np(v) for k, v in state_dict.items()
          if not k.startswith("text_model.")}
    p: Dict[str, Any] = {}

    def dense(dst, w, b=None):
        p[dst] = {"kernel": w.T} if b is None else {"kernel": w.T, "bias": b}

    def ln(dst, prefix):
        p[dst] = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    p["patch_embedding"] = {
        "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
    }
    p["class_embedding"] = sd["embeddings.class_embedding"]
    p["position_embedding"] = sd["embeddings.position_embedding.weight"]
    ln("pre_layernorm", "pre_layrnorm")
    for i in range(layers):
        pre = f"encoder.layers.{i}"
        ln(f"resblocks_{i}_ln_1", f"{pre}.layer_norm1")
        ln(f"resblocks_{i}_ln_2", f"{pre}.layer_norm2")
        qw = np.concatenate(
            [sd[f"{pre}.self_attn.{n}_proj.weight"] for n in "qkv"], 0
        )
        qb = np.concatenate(
            [sd[f"{pre}.self_attn.{n}_proj.bias"] for n in "qkv"], 0
        )
        dense(f"resblocks_{i}_attn_in_proj", qw, qb)
        dense(
            f"resblocks_{i}_attn_out_proj",
            sd[f"{pre}.self_attn.out_proj.weight"],
            sd[f"{pre}.self_attn.out_proj.bias"],
        )
        dense(f"resblocks_{i}_mlp_c_fc", sd[f"{pre}.mlp.fc1.weight"],
              sd[f"{pre}.mlp.fc1.bias"])
        dense(f"resblocks_{i}_mlp_c_proj", sd[f"{pre}.mlp.fc2.weight"],
              sd[f"{pre}.mlp.fc2.bias"])
    ln("post_layernorm", "post_layernorm")
    return {"params": p}


def _bicubic_resize(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(np.asarray(img, np.uint8))
    return np.asarray(pil.resize((size, size), Image.BICUBIC), np.float32)


def preprocess_images(images: Sequence, image_size: int) -> np.ndarray:
    """uint8 HWC crops (any sizes) -> (B, S, S, 3) CLIP-normalized float32."""
    out = np.stack([_bicubic_resize(im, image_size) for im in images]) / 255.0
    return ((out - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)).astype(np.float32)


class CLIPZeroShot:
    """Zero-shot classifier over a candidate-text list, from a local HF CLIPModel
    snapshot (config.json + weights + tokenizer files in the same dir or
    ``tokenizer_dir``)."""

    def __init__(self, snapshot_dir: str, tokenizer_dir: Optional[str] = None):
        with open(os.path.join(snapshot_dir, "config.json")) as f:
            cfg = json.load(f)
        vc, tc = cfg["vision_config"], cfg["text_config"]
        act = vc.get("hidden_act", "quick_gelu")
        self.vision = CLIPVisionTransformer(
            image_size=vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 14),
            width=vc["hidden_size"],
            layers=vc["num_hidden_layers"],
            heads=vc["num_attention_heads"],
            use_quick_gelu=act == "quick_gelu",
        )
        self.text = CLIPTextTransformer(
            vocab_size=tc["vocab_size"],
            width=tc["hidden_size"],
            layers=tc["num_hidden_layers"],
            heads=tc["num_attention_heads"],
            context_length=tc.get("max_position_embeddings", 77),
            use_quick_gelu=tc.get("hidden_act", "quick_gelu") == "quick_gelu",
        )
        sd = load_state_dict_from_dir(snapshot_dir)
        self.vision_params = clip_vision_torch_to_params(
            sd, vc["num_hidden_layers"]
        )
        self.text_params = clip_torch_to_params(
            {k: v for k, v in sd.items() if k.startswith("text_model.")},
            tc["num_hidden_layers"],
        )
        self.visual_projection = np.asarray(
            _t(sd["visual_projection.weight"]), np.float32
        ).T  # (width, proj)
        self.text_projection = np.asarray(
            _t(sd["text_projection.weight"]), np.float32
        ).T

        from .text_encoders import UniversalTokenizer

        self.tokenizer = UniversalTokenizer(
            "CompVis/stable-diffusion-v1-4",  # CLIP tokenizer route
            tokenizer_dir=tokenizer_dir or snapshot_dir,
        )
        self._vis_fn = jax.jit(self.vision.apply)
        self._txt_fn = jax.jit(self.text.apply)
        self._text_cache: Dict[tuple, np.ndarray] = {}

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        key = tuple(texts)
        if key not in self._text_cache:
            ids = np.asarray(self.tokenizer.tokenize(list(texts))["input_ids"])
            feats = np.asarray(self._txt_fn(self.text_params, ids), np.float32)
            pooled = feats[np.arange(len(texts)), ids.argmax(-1)]  # eot token
            emb = pooled @ self.text_projection
            self._text_cache[key] = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        return self._text_cache[key]

    def encode_images(self, images: Sequence) -> np.ndarray:
        pixels = preprocess_images(images, self.vision.image_size)
        pooled = np.asarray(self._vis_fn(self.vision_params, pixels), np.float32)
        emb = pooled @ self.visual_projection
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def classify(self, images: Sequence, candidate_texts: Sequence[str]) -> List[int]:
        """Argmax cosine-similarity candidate index per image."""
        sims = self.encode_images(images) @ self.encode_texts(candidate_texts).T
        return [int(i) for i in sims.argmax(-1)]


def _t(v):
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().float().numpy()
    except ImportError:
        pass
    return v
