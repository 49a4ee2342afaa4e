"""Per-dataset prepare pipeline tests against synthetic fixtures (network-free).

Covers the six reference pipelines' parse/filter/convert logic (VERDICT.md missing #1):
jdb tgz+jsonl pairing, diffdb parquet + enforced NSFW filter, cc12m wds tar pairing +
convert-time filtering, sa1b LLaVA caption merge under caption_syn_pixart_llava15,
textcaps first-reference-caption, coco annotation grouping - plus the shared
per-process MDS write + merge_index machinery.
"""

import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from micro_diffusion_tpu.datasets.mds import MDSReader
from micro_diffusion_tpu.datasets.prepare import (
    cc12m,
    coco,
    diffdb,
    jdb,
    sa1b,
    textcaps,
)
from micro_diffusion_tpu.datasets.prepare.common import parallel_mds_write


def _img(w=300, h=280, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


# --------------------------------------------------------------------------- jdb


def test_jdb_archive_layout():
    assert jdb.archive_path("train", 7) == "data/train/imgs/007.tgz"
    assert jdb.archive_path("valid", 123) == "data/valid/imgs/123.tgz"
    assert jdb.captions_path("train").endswith("train_anno_realease_repath.jsonl")


def test_jdb_convert(tmp_path):
    # images extracted for archives 000 and 001 only
    for arch in ("000", "001"):
        os.makedirs(tmp_path / "imgs" / arch)
    _img(seed=1).save(tmp_path / "imgs" / "000" / "a.jpg")
    _img(seed=2).save(tmp_path / "imgs" / "001" / "b.jpg")
    rows = [
        {"img_path": "./000/a.jpg", "prompt": "caption a"},
        {"img_path": "./001/b.jpg", "prompt": "caption b"},
        {"img_path": "./002/c.jpg", "prompt": "not downloaded"},  # skipped
        {"img_path": "./000/missing.jpg", "prompt": "gone"},  # unreadable: skipped
        {"img_path": "./000/a.jpg"},  # no prompt: skipped
    ]
    cap_file = tmp_path / "train_anno.jsonl"
    with open(cap_file, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    n = jdb.convert_to_mds(str(tmp_path / "imgs"), str(cap_file),
                           str(tmp_path / "mds"))
    assert n == 2
    r = MDSReader(str(tmp_path / "mds"))
    caps = sorted(s["caption"] for s in r)
    assert caps == ["caption a", "caption b"]
    assert r[0]["width"] == 300 and r[0]["height"] == 280


# ------------------------------------------------------------------------- diffdb


def test_diffdb_archive_layout():
    assert diffdb.archive_subfolder(1) == "diffusiondb-large-part-1"
    assert diffdb.archive_subfolder(10000) == "diffusiondb-large-part-1"
    assert diffdb.archive_subfolder(10001) == "diffusiondb-large-part-2"
    assert diffdb.archive_filename(37) == "part-000037.zip"
    assert diffdb.image_rel_path(2, "x.webp") == "images/part-000002/x.webp"


def test_diffdb_nsfw_filter_enforced(tmp_path):
    import pandas as pd

    part = tmp_path / "raw" / "images" / "part-000001"
    os.makedirs(part)
    for name, seed in (("ok.webp", 1), ("nsfw_img.webp", 2), ("nsfw_txt.webp", 3),
                       ("missing.webp", 4)):
        if name != "missing.webp":
            _img(seed=seed).save(part / name, "WEBP")
    df = pd.DataFrame({
        "part_id": [1, 1, 1, 1],
        "image_name": ["ok.webp", "nsfw_img.webp", "nsfw_txt.webp", "missing.webp"],
        "prompt": ["fine", "bad image", "bad prompt", "no file"],
        "image_nsfw": [0.1, 0.5, 0.0, 0.05],
        "prompt_nsfw": [0.2, 0.0, 0.21, 0.1],
    })
    meta = tmp_path / "metadata-large.parquet"
    df.to_parquet(meta)

    kept, dropped = diffdb.filter_metadata(df)
    assert dropped == 2 and list(kept["prompt"]) == ["fine", "no file"]

    n = diffdb.convert_to_mds(str(tmp_path / "raw"), str(tmp_path / "mds"),
                              metadata_parquet=str(meta), num_proc=1)
    assert n == 1  # 2 NSFW-dropped, 1 missing file skipped
    r = MDSReader(str(tmp_path / "mds"))
    assert r[0]["caption"] == "fine"
    # score exactly at the threshold is kept (filter is strict >, convert.py:67)
    kept2, _ = diffdb.filter_metadata(df, safety_threshold=0.5)
    assert len(kept2) == 4


# ------------------------------------------------------------------------- cc12m


def _make_wds_tar(path, pairs, extra=()):
    import io

    with tarfile.open(path, "w") as t:
        for stem, img, cap in pairs:
            buf = io.BytesIO()
            img.save(buf, "JPEG")
            ti = tarfile.TarInfo(f"{stem}.jpg")
            ti.size = buf.getbuffer().nbytes
            buf.seek(0)
            t.addfile(ti, buf)
            cap_b = cap.encode()
            ti = tarfile.TarInfo(f"{stem}.txt")
            ti.size = len(cap_b)
            t.addfile(ti, io.BytesIO(cap_b))
        for name, data in extra:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))


def test_cc12m_tar_pairing_and_filters(tmp_path):
    assert cc12m.archive_filename(3) == "cc12m-train-0003.tar"
    pairs = [
        ("s0", _img(300, 280, 1), "caption zero"),
        ("s1", _img(120, 100, 2), "too small"),
        ("s2", _img(800, 700, 3), "downsize me"),
    ]
    tar_path = tmp_path / "wds" / "cc12m-train-0000.tar"
    os.makedirs(tmp_path / "wds")
    _make_wds_tar(tar_path, pairs, extra=[("orphan.txt", b"no image")])

    got = list(cc12m.iter_tar_pairs(str(tar_path)))
    assert [c for _, c in got] == ["caption zero", "too small", "downsize me"]

    n = cc12m.convert_to_mds(str(tmp_path / "wds"), str(tmp_path / "mds256"),
                             min_side=256, downsize_to=512)
    assert n == 2  # small one dropped
    r = MDSReader(str(tmp_path / "mds256"))
    sizes = sorted((s["width"], s["height"]) for s in r)
    assert sizes[0] == (300, 280)
    assert min(sizes[1]) == 512  # 800x700 downsized so min side == 512

    # the min-side >= 512 variant keeps only the big image
    n512 = cc12m.convert_to_mds(str(tmp_path / "wds"), str(tmp_path / "mds512"),
                                min_side=512, downsize_to=512)
    assert n512 == 1


# -------------------------------------------------------------------------- sa1b


def test_sa1b_links_parsing():
    text = "file_name\tcdn_link\nsa_000000.tar\thttps://x/0\nsa_000001.tar\thttps://x/1\n"
    assert sa1b.parse_links_file(text) == [
        ("sa_000000.tar", "https://x/0"), ("sa_000001.tar", "https://x/1"),
    ]


def test_sa1b_caption_merge(tmp_path):
    imgs = tmp_path / "raw" / "sa_000000"
    caps = tmp_path / "captions"
    os.makedirs(imgs)
    os.makedirs(caps)
    _img(seed=1).save(imgs / "sa_1.jpg")
    _img(seed=2).save(imgs / "sa_2.jpg")
    (caps / "sa_1.txt").write_text("a llava caption\n")
    # sa_2 has no caption -> skipped (reference convert.py:92-97)

    n = sa1b.convert_to_mds(str(tmp_path / "raw"), str(caps),
                            str(tmp_path / "mds"), num_proc=1)
    assert n == 1
    r = MDSReader(str(tmp_path / "mds"))
    s = r[0]
    assert s["caption_syn_pixart_llava15"] == "a llava caption"
    assert "caption" not in s  # the caption_key is dataset-specific (specs.py)


# ---------------------------------------------------------------------- textcaps


def test_textcaps_first_reference_caption(tmp_path):
    samples = [
        {"image_height": 280, "image_width": 300, "image": _img(seed=1),
         "image_id": "id0", "reference_strs": ["first cap", "second cap"]},
        {"image_height": 280, "image_width": 300, "image": _img(seed=2),
         "image_id": "id1", "reference_strs": []},  # skipped
    ]
    n = textcaps.write_samples(samples, str(tmp_path / "mds"))
    assert n == 1
    r = MDSReader(str(tmp_path / "mds"))
    assert r[0]["caption"] == "first cap"
    assert r[0]["image_id"] == "id0"


# -------------------------------------------------------------------------- coco


def test_coco_annotation_grouping_and_convert(tmp_path):
    assert coco.image_file_name(42) == "COCO_val2014_000000000042.jpg"
    anns = [
        {"image_id": 42, "caption": "first\ncaption"},
        {"image_id": 42, "caption": "second"},
        {"image_id": 7, "caption": "lonely"},
        {"image_id": 99, "caption": "image missing"},
    ]
    grouped = coco.group_captions(anns)
    assert grouped[42] == ["firstcaption", "second"]  # newline stripped, order kept

    os.makedirs(tmp_path / "annotations")
    with open(tmp_path / "annotations" / "captions_val2014.json", "w") as f:
        json.dump({"annotations": anns}, f)
    os.makedirs(tmp_path / "val2014")
    _img(seed=1).save(tmp_path / "val2014" / coco.image_file_name(42))
    _img(seed=2).save(tmp_path / "val2014" / coco.image_file_name(7))

    n = coco.convert_to_mds(str(tmp_path), str(tmp_path / "mds"))
    assert n == 2  # id 99 has no image file
    r = MDSReader(str(tmp_path / "mds"))
    caps = sorted(s["caption"] for s in r)
    assert caps == ["firstcaption", "lonely"]  # first caption per image


def test_sa1b_caption_key_flows_through_precompute(tmp_path):
    """The dataset-specific caption column is consumed by the precompute stage
    (specs.py caption_key -> PrecomputeImageDataset) and re-emitted under the
    canonical 'caption' name."""
    from micro_diffusion_tpu.datasets.prepare.precompute import precompute
    from micro_diffusion_tpu.datasets.prepare.specs import DATASETS
    from test_prepare import _StubTextEncoder, _StubTokenizer, _StubVAE

    imgs = tmp_path / "raw" / "sa_000000"
    caps = tmp_path / "captions"
    os.makedirs(imgs)
    os.makedirs(caps)
    for i in range(2):
        _img(600, 560, seed=i).save(imgs / f"sa_{i}.jpg")
        (caps / f"sa_{i}.txt").write_text(f"llava caption {i}")
    sa1b.convert_to_mds(str(tmp_path / "raw"), str(caps), str(tmp_path / "mds"))

    spec = DATASETS["sa1b"]
    assert spec.caption_key == sa1b.CAPTION_COLUMN
    n = precompute(
        [str(tmp_path / "mds")], str(tmp_path / "latents"),
        vae=_StubVAE(), text_encoder=_StubTextEncoder(), tokenizer=_StubTokenizer(),
        batch_size=2, resize_sizes=(256,), caption_key=spec.caption_key,
        process_index=0, process_count=1,
    )
    assert n == 2
    r = MDSReader(str(tmp_path / "latents"))
    assert sorted(s["caption"] for s in r) == ["llava caption 0", "llava caption 1"]


# ------------------------------------------------------------------ shared helper


def _writer_worker(items, subdir):
    from micro_diffusion_tpu.datasets.mds import MDSWriter

    with MDSWriter(out=subdir, columns={"v": "int32"}) as w:
        for v in items:
            w.write({"v": int(v)})
    return len(items)


def test_parallel_mds_write_merges(tmp_path):
    n = parallel_mds_write(_writer_worker, list(range(17)), str(tmp_path / "mds"),
                           num_proc=3)
    assert n == 17
    r = MDSReader(str(tmp_path / "mds"))
    assert sorted(s["v"] for s in r) == list(range(17))
