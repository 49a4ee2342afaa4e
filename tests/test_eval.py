"""FID math tests: streaming stats vs direct computation, closed-form Frechet
distances, and the generation driver with a stub model."""

import json

import numpy as np

from micro_diffusion_tpu.eval import FIDStats, compute_fid_from_stats, frechet_distance


def test_streaming_stats_match_direct():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 16))
    stats = FIDStats(dim=16)
    for lo in range(0, 500, 64):
        stats.update(feats[lo : lo + 64])
    np.testing.assert_allclose(stats.mean, feats.mean(0), rtol=1e-10)
    np.testing.assert_allclose(stats.cov, np.cov(feats, rowvar=False), rtol=1e-8)


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(1)
    mu = rng.standard_normal(8)
    a = rng.standard_normal((100, 8))
    sigma = np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_closed_form_isotropic():
    """For N(mu1, aI) vs N(mu2, bI): d^2 = ||mu1-mu2||^2 + D*(a + b - 2 sqrt(ab))."""
    d = 6
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    a, b = 1.5, 0.5
    fid = frechet_distance(mu1, a * np.eye(d), mu2, b * np.eye(d))
    expected = 4.0 * d + d * (a + b - 2 * np.sqrt(a * b))
    np.testing.assert_allclose(fid, expected, rtol=1e-8)


def test_fid_sensitivity():
    rng = np.random.default_rng(2)
    real = FIDStats(dim=8)
    real.update(rng.standard_normal((1000, 8)))
    close = FIDStats(dim=8)
    close.update(rng.standard_normal((1000, 8)))
    far = FIDStats(dim=8)
    far.update(rng.standard_normal((1000, 8)) * 2.0 + 3.0)
    assert compute_fid_from_stats(real, close) < compute_fid_from_stats(real, far)


def test_stats_save_load(tmp_path):
    s = FIDStats(dim=4)
    s.update(np.random.default_rng(0).standard_normal((10, 4)))
    s.save(tmp_path / "stats.npz")
    s2 = FIDStats.load(tmp_path / "stats.npz")
    np.testing.assert_allclose(s.mean, s2.mean)
    np.testing.assert_allclose(s.cov, s2.cov)


def test_generate_images_driver(tmp_path):
    from micro_diffusion_tpu.eval.generate_eval_images import generate_images

    class StubModel:
        def generate(self, params, prompt, guidance_scale, num_inference_steps, seed):
            return np.full((len(prompt), 3, 8, 8), 0.5, np.float32)

    n = generate_images(
        StubModel(), None, ["a", "b", "c"], str(tmp_path / "out"), batch_size=2
    )
    assert n == 3
    manifest = json.load(open(tmp_path / "out" / "manifest.json"))
    assert len(manifest) == 3
    assert manifest[0]["caption"] == "a"


def test_fid_cli_end_to_end(tmp_path):
    """generate images -> pt_inception weights on disk -> one-CLI FID number
    (VERDICT.md next-round #4 done-criterion)."""
    import torch
    from PIL import Image

    from micro_diffusion_tpu.eval import fid
    from micro_diffusion_tpu.eval.inception import parameter_shapes, synthetic_params

    # synthetic pt_inception checkpoint on disk
    weights = tmp_path / "pt_inception.pth"
    torch.save({k: torch.from_numpy(v) for k, v in synthetic_params(0).items()},
               weights)

    rng = np.random.default_rng(0)

    def write_images(dirname, n, offset):
        dirname.mkdir()
        for i in range(n):
            arr = (rng.random((64, 64, 3)) * 127 + offset).astype(np.uint8)
            Image.fromarray(arr).save(dirname / f"{i:03d}.png")

    write_images(tmp_path / "real", 8, 0)
    write_images(tmp_path / "fake_close", 8, 0)
    write_images(tmp_path / "fake_far", 8, 120)

    fid_close = fid.main([
        "--real", str(tmp_path / "real"), "--fake", str(tmp_path / "fake_close"),
        "--inception_weights", str(weights), "--batch_size", "4",
        "--save_real_stats", str(tmp_path / "real_stats.npz"),
    ])
    fid_far = fid.main([
        "--real", str(tmp_path / "real_stats.npz"),  # stats reuse path
        "--fake", str(tmp_path / "fake_far"),
        "--inception_weights", str(weights), "--batch_size", "4",
    ])
    assert np.isfinite(fid_close) and np.isfinite(fid_far)
    assert fid_close < fid_far  # brightness-shifted set is farther


def test_create_latent_diffusion_separate_encoder_dirs(monkeypatch):
    """Regression (VERDICT.md weak #4): the text encoder/tokenizer must load from
    their own snapshot dirs, not the VAE's."""
    import micro_diffusion_tpu.models.text_encoders as te
    import micro_diffusion_tpu.models.vae as vae_mod
    from micro_diffusion_tpu.models.diffusion import create_latent_diffusion

    seen = {}
    monkeypatch.setattr(
        vae_mod.AutoencoderKL, "from_pretrained",
        classmethod(lambda cls, name, weights_dir=None, **kw:
                    seen.setdefault("vae", weights_dir)),
    )
    monkeypatch.setattr(
        te, "UniversalTextEncoder",
        lambda name, dtype=None, weights_dir=None: seen.setdefault("te", weights_dir),
    )
    monkeypatch.setattr(
        te, "UniversalTokenizer",
        lambda name, tokenizer_dir=None: seen.setdefault("tok", tokenizer_dir),
    )
    create_latent_diffusion(
        dit_arch="MicroDiT_Micro_2", latent_res=16, load_encoders=True,
        weights_dir="/vae_dir", text_encoder_weights_dir="/te_dir",
        tokenizer_dir="/tok_dir",
    )
    assert seen == {"vae": "/vae_dir", "te": "/te_dir", "tok": "/tok_dir"}


def test_geneval_detection_evaluation():
    """The detection->verdict bridge (GenEval's scoring core)."""
    from micro_diffusion_tpu.eval.geneval import (
        check_position,
        evaluate_detections,
        score_generated_images,
    )

    det = lambda cls, bbox, score=0.9, **kw: {
        "class": cls, "bbox": bbox, "score": score, **kw
    }

    # presence: count is a minimum outside 'counting'
    entry = {"tag": "single_object", "include": [{"class": "dog", "count": 1}]}
    assert evaluate_detections(entry, [det("dog", [0, 0, 10, 10])])
    assert evaluate_detections(
        entry, [det("dog", [0, 0, 10, 10]), det("dog", [20, 0, 30, 10])]
    )
    assert not evaluate_detections(entry, [det("cat", [0, 0, 10, 10])])
    # low-confidence detections are ignored
    assert not evaluate_detections(entry, [det("dog", [0, 0, 10, 10], score=0.1)])

    # counting: exact
    entry = {"tag": "counting", "include": [{"class": "dog", "count": 2}]}
    two = [det("dog", [0, 0, 10, 10]), det("dog", [20, 0, 30, 10])]
    assert evaluate_detections(entry, two)
    assert not evaluate_detections(entry, two + [det("dog", [40, 0, 50, 10])])

    # colors: from the detection record
    entry = {"tag": "colors", "include": [{"class": "car", "count": 1,
                                           "color": "red"}]}
    assert evaluate_detections(entry, [det("car", [0, 0, 10, 10], color="red")])
    assert not evaluate_detections(entry, [det("car", [0, 0, 10, 10],
                                               color="blue")])

    # position: direction must dominate
    assert check_position([0, 0, 10, 10], [50, 0, 60, 10], "left of")
    assert not check_position([50, 0, 60, 10], [0, 0, 10, 10], "left of")
    assert check_position([0, 0, 10, 10], [0, 50, 10, 60], "above")
    assert not check_position([0, 0, 10, 10], [8, 50, 18, 60], "right of")
    entry = {"tag": "position", "include": [
        {"class": "dog", "count": 1, "position": ("left of", "cat")},
        {"class": "cat", "count": 1},
    ]}
    assert evaluate_detections(
        entry, [det("dog", [0, 0, 10, 10]), det("cat", [50, 0, 60, 10])]
    )
    assert not evaluate_detections(
        entry, [det("dog", [50, 0, 60, 10]), det("cat", [0, 0, 10, 10])]
    )

    # end-to-end scoring over a manifest
    manifest = [
        {"tag": "single_object", "include": [{"class": "dog", "count": 1}]},
        {"tag": "single_object", "include": [{"class": "cat", "count": 1}]},
    ]
    dets = [[det("dog", [0, 0, 10, 10])], [det("dog", [0, 0, 10, 10])]]
    scores = score_generated_images(manifest, dets)
    assert scores["single_object"] == 0.5


def test_geneval_hue_color_classifier():
    from micro_diffusion_tpu.eval.geneval import hue_color_classifier

    red = np.zeros((20, 20, 3), np.uint8)
    red[5:15, 5:15] = (220, 30, 30)
    assert hue_color_classifier(red, [5, 5, 15, 15]) == "red"
    green = np.zeros((20, 20, 3), np.uint8)
    green[:, :] = (20, 200, 40)
    assert hue_color_classifier(green, [0, 0, 20, 20]) == "green"
    white = np.full((20, 20, 3), 245, np.uint8)
    assert hue_color_classifier(white, [0, 0, 20, 20]) == "white"


def test_geneval_prompts_and_scores():
    from micro_diffusion_tpu.eval.geneval import (
        CATEGORIES,
        aggregate_scores,
        build_prompt_manifest,
    )

    manifest = build_prompt_manifest(["dog", "cat", "car", "apple"], per_category=5)
    assert len(manifest) == 5 * 6
    tags = {m["tag"] for m in manifest}
    assert tags == set(CATEGORIES)
    for m in manifest:
        assert m["prompt"].startswith("a photo of")
        assert m["include"]
    counting = [m for m in manifest if m["tag"] == "counting"]
    assert all(m["include"][0]["count"] in (2, 3, 4) for m in counting)

    results = [
        {"tag": "single_object", "correct": True},
        {"tag": "single_object", "correct": False},
        {"tag": "colors", "correct": True},
    ]
    scores = aggregate_scores(results)
    assert scores["single_object"] == 0.5
    assert scores["colors"] == 1.0
