"""Official GenEval benchmark assets: vendored 553-prompt manifest + CLIP color
judge wiring (VERDICT round-2 Missing #2 / Weak #6)."""

import json
from collections import Counter

import numpy as np

from micro_diffusion_tpu.eval.geneval import (
    COCO_CLASSES,
    GENEVAL_COLORS,
    OFFICIAL_COUNTS,
    build_official_manifest,
    evaluate_detections,
    load_official_manifest,
    score_generated_images,
)


def test_vendored_manifest_is_the_official_benchmark_shape():
    manifest = load_official_manifest()
    assert len(manifest) == 553
    counts = Counter(e["tag"] for e in manifest)
    assert dict(counts) == OFFICIAL_COUNTS
    # deterministic: regeneration reproduces the committed file exactly
    assert manifest == build_official_manifest()
    # vocabulary closure: every referenced class is COCO-80, colors official
    for e in manifest:
        assert e["prompt"].startswith("a photo of ")
        for req in e["include"]:
            assert req["class"] in COCO_CLASSES
            if "color" in req:
                assert req["color"] in GENEVAL_COLORS
            if "position" in req:
                rel, other = req["position"]
                assert rel in ("left of", "right of", "above", "below")
                assert other in COCO_CLASSES
    # single_object covers every class exactly once
    singles = [e["include"][0]["class"] for e in manifest
               if e["tag"] == "single_object"]
    assert sorted(singles) == sorted(COCO_CLASSES)
    # no duplicate prompts within a category
    for tag in OFFICIAL_COUNTS:
        prompts = [e["prompt"] for e in manifest if e["tag"] == tag]
        assert len(prompts) == len(set(prompts)), tag


def test_counting_is_exact_and_two_object_is_minimum():
    manifest = load_official_manifest()
    counting = next(e for e in manifest if e["tag"] == "counting")
    cls = counting["include"][0]["class"]
    want = counting["include"][0]["count"]
    det = {"class": cls, "bbox": [0, 0, 10, 10], "score": 0.9}
    assert evaluate_detections(counting, [det] * want)
    assert not evaluate_detections(counting, [det] * (want + 1))  # exact

    single = next(e for e in manifest if e["tag"] == "single_object")
    det1 = {"class": single["include"][0]["class"], "bbox": [0, 0, 5, 5],
            "score": 0.9}
    assert evaluate_detections(single, [det1, det1])  # minimum, not exact


class _StubZeroShot:
    """classify() that always picks the candidate naming the crop's dominant
    channel - lets the CLIP color path run end-to-end without weights."""

    def classify(self, images, texts):
        crop = np.asarray(images[0], np.float32)
        chan = int(crop.mean((0, 1)).argmax())
        name = {0: " red ", 1: " green ", 2: " blue "}[chan]
        return [next(i for i, t in enumerate(texts) if name in t)]


def test_clip_color_fn_judges_crops(monkeypatch):
    import micro_diffusion_tpu.eval.geneval as ge
    import micro_diffusion_tpu.models.clip_zero_shot as zs_mod

    monkeypatch.setattr(zs_mod, "CLIPZeroShot",
                        lambda snap, tokenizer_dir=None: _StubZeroShot())
    color_fn = ge.make_clip_color_fn("/fake/dir")

    img = np.zeros((64, 64, 3), np.uint8)
    img[10:30, 10:30, 1] = 220  # green patch
    assert color_fn(img, [10, 10, 30, 30], "car") == "green"

    # end-to-end scoring with the CLIP judge on a colors entry
    entry = {"tag": "colors", "prompt": "a photo of a green car",
             "include": [{"class": "car", "count": 1, "color": "green"}]}
    dets = [[{"class": "car", "bbox": [10, 10, 30, 30], "score": 0.9}]]
    scores = score_generated_images([entry], dets, images=[img],
                                    color_fn=color_fn)
    assert scores["colors"] == 1.0
