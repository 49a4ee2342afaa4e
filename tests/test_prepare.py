"""Prepare pipeline tests: caption cleaning, convert (images -> MDS), extract/filter,
and the full precompute loop (image MDS -> latent MDS) with tiny random-weight
encoders, verifying the output is consumable by the train-time latents loader."""

import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from micro_diffusion_tpu.datasets.captions import CaptionProcessor, clean_caption
from micro_diffusion_tpu.datasets.latents_loader import (
    build_streaming_latents_dataloader,
)
from micro_diffusion_tpu.datasets.mds import MDSReader
from micro_diffusion_tpu.datasets.prepare.common import resize_center_crop
from micro_diffusion_tpu.datasets.prepare.convert import convert_to_mds
from micro_diffusion_tpu.datasets.prepare.download import extract_and_filter
from micro_diffusion_tpu.datasets.prepare.precompute import precompute


def make_images(dirname, n=6, size=(300, 280)):
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(n):
        img = Image.fromarray(
            (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
        )
        img.save(os.path.join(dirname, f"img{i}.jpg"))
        caps[f"img{i}"] = f"a test caption number {i}"
    return caps


def test_clean_caption():
    assert clean_caption("Check https://example.com/foo NOW") == "check now"
    assert clean_caption("hello   <b>world</b> @someuser") == "hello world"
    assert "person" in clean_caption("<person> walking")
    out = CaptionProcessor()("Buy NOW!! free shipping http://x.com/a.jpg")
    assert "shipping" not in out and "http" not in out


def test_resize_center_crop():
    img = Image.new("RGB", (300, 200), (255, 0, 0))
    arr = resize_center_crop(img, 128)
    assert arr.shape == (3, 128, 128)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    np.testing.assert_allclose(arr[0], 1.0)  # red channel saturated
    np.testing.assert_allclose(arr[1], -1.0)


def test_convert_to_mds(tmp_path):
    caps = make_images(tmp_path / "imgs", n=5)
    # one image below min side: should be filtered
    Image.new("RGB", (100, 100)).save(tmp_path / "imgs" / "small.jpg")
    caps["small"] = "too small"
    with open(tmp_path / "caps.json", "w") as f:
        json.dump(caps, f)
    n = convert_to_mds(
        "jdb", str(tmp_path / "imgs"), str(tmp_path / "caps.json"),
        str(tmp_path / "mds"),
    )
    assert n == 5
    r = MDSReader(str(tmp_path / "mds"))
    s = r[0]
    assert s["width"] == 300 and s["height"] == 280
    assert s["caption"].startswith("a test caption")
    assert s["jpg"].size == (300, 280)


def test_extract_and_filter(tmp_path):
    imgs = tmp_path / "src"
    make_images(imgs, n=3, size=(700, 600))  # will be downsized to min side 512
    Image.new("RGB", (120, 90)).save(imgs / "tiny.jpg")  # filtered out
    tar_path = tmp_path / "arch.tar"
    with tarfile.open(tar_path, "w") as t:
        for f in os.listdir(imgs):
            t.add(os.path.join(imgs, f), arcname=f)
    out = tmp_path / "out"
    kept = extract_and_filter(str(tar_path), str(out), min_side=256, downsize_to=512)
    assert kept == 3
    for f in os.listdir(out):
        w, h = Image.open(out / f).size
        assert min(w, h) == 512  # downsized


class _StubTokenizer:
    def tokenize(self, captions):
        ids = np.zeros((len(captions), 8), np.int32)
        for i, c in enumerate(captions):
            for j, ch in enumerate(c[:8]):
                ids[i, j] = ord(ch) % 50
        return {"input_ids": ids}


class _StubTextEncoder:
    def encode(self, ids, attention_mask=None):
        b = ids.shape[0]
        rng = jax.random.PRNGKey(int(np.sum(ids)) % 1000)
        return jax.random.normal(rng, (b, 1, 8, 16)), None


class _StubVAE:
    scaling_factor = 0.5

    def encode(self, imgs, rng=None):
        b, c, h, w = imgs.shape
        # fake f8 "latents": average-pool 8x8 into 4 channels
        x = jnp.asarray(imgs).reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
        return jnp.concatenate([x, x[:, :1]], axis=1)  # (B, 4, h/8, w/8)


def test_precompute_end_to_end(tmp_path):
    caps = make_images(tmp_path / "imgs", n=6, size=(600, 560))
    with open(tmp_path / "caps.json", "w") as f:
        json.dump(caps, f)
    convert_to_mds(
        "jdb", str(tmp_path / "imgs"), str(tmp_path / "caps.json"),
        str(tmp_path / "mds"),
    )
    n = precompute(
        [str(tmp_path / "mds")],
        str(tmp_path / "latents"),
        vae=_StubVAE(),
        text_encoder=_StubTextEncoder(),
        tokenizer=_StubTokenizer(),
        batch_size=4,
        resize_sizes=(256, 512),
        process_index=0,
        process_count=1,
    )
    assert n == 6
    assert os.path.exists(tmp_path / "latents" / "index.json")

    # and the train-time loader consumes the output
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "latents"), batch_size=2, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, num_epochs=1,
    )
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image_latents"].shape == (2, 4, 32, 32)
    assert batches[0]["caption_latents"].shape == (2, 1, 8, 16)
    dl512 = build_streaming_latents_dataloader(
        str(tmp_path / "latents"), batch_size=2, image_size=512, cap_seq_size=8,
        cap_emb_dim=16, num_epochs=1,
    )
    assert next(iter(dl512))["image_latents"].shape == (2, 4, 64, 64)
