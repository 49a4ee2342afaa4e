"""End-to-end dry run of eval/run_eval.sh on synthetic tiny weights.

One subprocess invocation covers the FULL released-checkpoint eval chain
(VERDICT round-2 next-round #8): checkpoint load -> DiT sampling -> VAE decode ->
PNG writing -> InceptionV3 FID -> GenEval generation + detection scoring. The
moment real weights exist, the same command produces the paper numbers.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_weights_dir(tmp_path):
    """vae/ + text_encoder/ + tokenizer/ + clip/ snapshot layout with tiny
    synthetic weights in the exact HF formats the loaders consume. clip/ is a
    FULL CLIPModel snapshot - run_eval.sh auto-detects it and switches the
    GenEval color scorer from the hue heuristic to the official CLIP
    zero-shot judge."""
    from test_clip_zero_shot import tiny_clip, write_clip_tokenizer, write_snapshot
    from test_vae_oracle import _TorchVAE

    weights = tmp_path / "weights"

    # --- VAE: diffusers-shaped tiny AutoencoderKL snapshot
    vae_dir = weights / "vae"
    vae_dir.mkdir(parents=True)
    vae = _TorchVAE(chans=(32, 64), layers=1, latent=4)
    torch.save(vae.state_dict(), vae_dir / "pytorch_model.bin")
    with open(vae_dir / "config.json", "w") as f:
        json.dump({
            "block_out_channels": [32, 64], "layers_per_block": 1,
            "latent_channels": 4, "scaling_factor": 0.13025,
        }, f)

    # --- text encoder: tiny HF CLIPTextModel snapshot (local-dir route)
    te_dir = weights / "text_encoder"
    te_dir.mkdir()
    tok_dir = weights / "tokenizer"
    bos_id, eos_id = write_clip_tokenizer(str(tok_dir))
    clip, cfg = tiny_clip(bos_id, eos_id)
    # standalone CLIPTextModel snapshots carry the text_model. prefix
    torch.save(
        {"text_model." + k: v for k, v in clip.text_model.state_dict().items()},
        te_dir / "pytorch_model.bin",
    )
    with open(te_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": cfg.text_config.vocab_size,
            "hidden_size": cfg.text_config.hidden_size,
            "num_hidden_layers": cfg.text_config.num_hidden_layers,
            "num_attention_heads": cfg.text_config.num_attention_heads,
            "max_position_embeddings": 77,
            "hidden_act": "quick_gelu",
        }, f)

    # --- full CLIPModel snapshot: the GenEval zero-shot color judge
    write_snapshot(clip, cfg, str(weights / "clip"))
    return weights, cfg.text_config.hidden_size


def build_checkpoint(tmp_path, te_dir, caption_dim):
    """Tiny-DiT torch .pt checkpoint in the reference layout."""
    import jax

    from micro_diffusion_tpu.models.diffusion import create_latent_diffusion
    from micro_diffusion_tpu.models.interop import params_to_torch_state_dict

    model = create_latent_diffusion(
        dit_arch="MicroDiT_Micro_2", latent_res=8, in_channels=4,
        text_encoder_name=str(te_dir), load_encoders=False,
    )
    params = model.init(jax.random.PRNGKey(0))
    assert model.dit.caption_channels == caption_dim
    sd = params_to_torch_state_dict(params["params"])
    ckpt = tmp_path / "dit.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ckpt)
    return ckpt


def test_run_eval_script_full_chain(tmp_path):
    from PIL import Image

    from micro_diffusion_tpu.eval.inception import synthetic_params

    weights, caption_dim = build_weights_dir(tmp_path)
    ckpt = build_checkpoint(tmp_path, weights / "text_encoder", caption_dim)

    captions = tmp_path / "captions.json"
    captions.write_text(json.dumps(["a red car", "a green dog", "a blue boat"]))

    real = tmp_path / "real"
    real.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(real / f"{i}.png")

    inception = tmp_path / "pt_inception.pth"
    torch.save({k: torch.from_numpy(v) for k, v in synthetic_params(0).items()},
               inception)

    # 2-row GenEval manifest (a real-weights run uses the vendored 553 prompts)
    geneval_manifest = tmp_path / "geneval.jsonl"
    with open(geneval_manifest, "w") as f:
        f.write(json.dumps({"tag": "single_object", "prompt": "a photo of a car",
                            "include": [{"class": "car", "count": 1}]}) + "\n")
        f.write(json.dumps({"tag": "colors", "prompt": "a photo of a red dog",
                            "include": [{"class": "dog", "count": 1,
                                         "color": "red"}]}) + "\n")
    detections = tmp_path / "det.json"
    detections.write_text(json.dumps([
        [{"class": "car", "bbox": [2, 2, 20, 20], "score": 0.9}],
        [{"class": "dog", "bbox": [2, 2, 20, 20], "score": 0.9}],
    ]))

    out = tmp_path / "out"
    env = dict(os.environ)
    env["MDT_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    res = subprocess.run(
        ["bash", os.path.join(REPO, "eval", "run_eval.sh"), str(ckpt),
         str(weights), str(out),
         "--captions", str(captions), "--real", str(real),
         "--inception", str(inception),
         "--geneval-manifest", str(geneval_manifest),
         "--detections", str(detections),
         "--arch", "MicroDiT_Micro_2", "--latent_res", "8",
         "--pos_interp_scale", "1.0",
         "--text-encoder-name", str(weights / "text_encoder"),
         "--steps", "2", "--cfg", "1.5", "--batch", "2", "--seed", "7"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]

    # FID leg: one generated PNG per caption + a finite score
    pngs = [f for f in os.listdir(out / "fid_images") if f.endswith(".png")]
    assert len(pngs) == 3
    fid = json.loads((out / "fid.json").read_text())
    assert np.isfinite(fid["fid"]) and fid["fake_n"] == 3

    # GenEval leg: per-prompt images + official scoring rules applied,
    # colors judged by the CLIP zero-shot judge (weights/clip auto-detected
    # by run_eval.sh; the 'colors' detection has no color field, so the judge
    # classified the actual generated crop - its verdict on a random tiny
    # model's output is arbitrary, so only the judge IDENTITY is asserted)
    assert len(os.listdir(out / "geneval_images")) >= 2
    scores = json.loads((out / "geneval.json").read_text())
    assert scores["single_object"] == 1.0
    assert "overall" in scores
    assert scores["color_judge"] == "clip_zero_shot"
    assert 0.0 <= scores["colors"] <= 1.0
    # per-image records in the upstream geneval results.jsonl schema
    rows = [json.loads(l) for l in
            (out / "geneval_results.jsonl").read_text().splitlines()]
    assert len(rows) == 2
    assert set(rows[0]) == {"filename", "tag", "prompt", "correct"}
    assert rows[0]["tag"] == "single_object" and rows[0]["correct"] is True
