"""CLIP vision tower + zero-shot head vs the installed torch ``transformers``.

Same validation pattern as tests/test_text_encoders.py: instantiate a tiny
randomly-initialized HF CLIPModel, convert its state dict, and require the JAX
forward to match."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_clip(bos_id=126, eos_id=127):
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(
            vocab_size=128, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=bos_id, eos_token_id=eos_id,
        ),
        CLIPVisionConfig(
            image_size=28, patch_size=14, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        ),
        projection_dim=16,
    )
    model = CLIPModel(cfg).eval()
    return model, cfg


def test_vision_tower_matches_transformers():
    from micro_diffusion_tpu.models.clip_zero_shot import (
        CLIPVisionTransformer,
        clip_vision_torch_to_params,
    )

    model, cfg = tiny_clip()
    vc = cfg.vision_config
    tower = CLIPVisionTransformer(
        image_size=vc.image_size, patch_size=vc.patch_size, width=vc.hidden_size,
        layers=vc.num_hidden_layers, heads=vc.num_attention_heads,
        use_quick_gelu=True,
    )
    params = clip_vision_torch_to_params(
        model.vision_model.state_dict(), vc.num_hidden_layers
    )

    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    ours = np.asarray(tower.apply(params, pixels))

    with torch.no_grad():
        ref = model.vision_model(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).pooler_output.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def write_snapshot(model, cfg, dirname):
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, "config.json"), "w") as f:
        json.dump(
            {
                "vision_config": {
                    "image_size": cfg.vision_config.image_size,
                    "patch_size": cfg.vision_config.patch_size,
                    "hidden_size": cfg.vision_config.hidden_size,
                    "num_hidden_layers": cfg.vision_config.num_hidden_layers,
                    "num_attention_heads": cfg.vision_config.num_attention_heads,
                    "hidden_act": "quick_gelu",
                },
                "text_config": {
                    "vocab_size": cfg.text_config.vocab_size,
                    "hidden_size": cfg.text_config.hidden_size,
                    "num_hidden_layers": cfg.text_config.num_hidden_layers,
                    "num_attention_heads": cfg.text_config.num_attention_heads,
                    "max_position_embeddings": 77,
                    "hidden_act": "quick_gelu",
                },
                "projection_dim": cfg.projection_dim,
            },
            f,
        )
    torch.save(model.state_dict(), os.path.join(dirname, "pytorch_model.bin"))


def write_clip_tokenizer(dirname):
    """Minimal valid CLIPTokenizer assets (vocab + merges)."""
    os.makedirs(dirname, exist_ok=True)
    # eot must get the HIGHEST id: CLIP pools the text embedding at
    # ids.argmax(-1), which is the eot position only because the real CLIP vocab
    # puts <|endoftext|> last (49407). Mirror that here.
    words = ["red", "green", "blue", "photo", "of", "a", "an", "car", "dog"]
    vocab = {}
    for w in words:
        vocab[w + "</w>"] = len(vocab)
    for ch in "abcdefghijklmnopqrstuvwxyz ":
        tok = ch + "</w>"
        if tok not in vocab:
            vocab[tok] = len(vocab)
        if ch not in vocab:
            vocab[ch] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    bos_id, eos_id = vocab["<|startoftext|>"], vocab["<|endoftext|>"]
    with open(os.path.join(dirname, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirname, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return bos_id, eos_id


def test_zero_shot_pipeline_matches_transformers(tmp_path):
    """Full CLIPZeroShot flow (snapshot load, both towers, projections, cosine
    ranking) against transformers' own image/text feature heads."""
    from micro_diffusion_tpu.models.clip_zero_shot import CLIPZeroShot

    snap = str(tmp_path / "clip")
    bos_id, eos_id = write_clip_tokenizer(snap)
    model, cfg = tiny_clip(bos_id, eos_id)
    write_snapshot(model, cfg, snap)

    zs = CLIPZeroShot(snap)
    rng = np.random.default_rng(2)
    crops = [rng.integers(0, 255, (20, 30, 3), np.uint8) for _ in range(2)]
    texts = ["a photo of a red car", "a photo of a green dog"]

    img_emb = zs.encode_images(crops)
    txt_emb = zs.encode_texts(texts)

    from micro_diffusion_tpu.models.clip_zero_shot import preprocess_images

    pixels = preprocess_images(crops, cfg.vision_config.image_size)
    ids = np.asarray(zs.tokenizer.tokenize(texts)["input_ids"])
    with torch.no_grad():
        ref_img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
        ref_txt = model.get_text_features(
            input_ids=torch.from_numpy(ids)
        ).numpy()
    ref_img = ref_img / np.linalg.norm(ref_img, axis=-1, keepdims=True)
    ref_txt = ref_txt / np.linalg.norm(ref_txt, axis=-1, keepdims=True)

    np.testing.assert_allclose(img_emb, ref_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(txt_emb, ref_txt, rtol=2e-4, atol=2e-4)

    ranks = zs.classify(crops, texts)
    ref_ranks = (ref_img @ ref_txt.T).argmax(-1).tolist()
    assert ranks == ref_ranks
