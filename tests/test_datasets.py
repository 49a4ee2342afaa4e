"""Data plane tests: MDS format round-trip (+multi-shard, merge_index) and the streaming
latents loader (determinism, per-host partitioning, resume, caption drop)."""

import json
import os

import numpy as np
import pytest

from micro_diffusion_tpu.datasets import (
    MDSReader,
    MDSWriter,
    build_streaming_latents_dataloader,
    merge_index,
)


def write_latents_dataset(dirname, n=32, cap_seq=8, cap_dim=16, latent=4, seed=0):
    rng = np.random.default_rng(seed)
    cols = {
        "caption": "str",
        "caption_latents": "bytes",
        "latents_256": "bytes",
        "latents_512": "bytes",
    }
    with MDSWriter(out=str(dirname), columns=cols) as w:
        for i in range(n):
            w.write(
                {
                    "caption": f"caption {i}",
                    "caption_latents": rng.standard_normal(
                        (1, cap_seq, cap_dim)
                    ).astype(np.float16).tobytes(),
                    "latents_256": rng.standard_normal(
                        (latent, 32, 32)
                    ).astype(np.float16).tobytes(),
                    "latents_512": rng.standard_normal(
                        (latent, 64, 64)
                    ).astype(np.float16).tobytes(),
                }
            )


def test_mds_round_trip(tmp_path):
    d = tmp_path / "ds"
    cols = {"width": "int32", "height": "int32", "jpg": "bytes", "caption": "str"}
    with MDSWriter(out=str(d), columns=cols) as w:
        for i in range(10):
            w.write(
                {"width": 100 + i, "height": 200 + i, "jpg": bytes([i] * (i + 1)),
                 "caption": f"sample-{i} ünïcode"}
            )
    r = MDSReader(str(d))
    assert len(r) == 10
    for i in range(10):
        s = r[i]
        assert s["width"] == 100 + i
        assert s["height"] == 200 + i
        assert s["jpg"] == bytes([i] * (i + 1))
        assert s["caption"] == f"sample-{i} ünïcode"


def test_mds_multi_shard(tmp_path):
    d = tmp_path / "ds"
    cols = {"payload": "bytes"}
    with MDSWriter(out=str(d), columns=cols, size_limit=1000) as w:
        for i in range(20):
            w.write({"payload": bytes([i]) * 300})
    r = MDSReader(str(d))
    assert len(r.shards) > 1
    assert len(r) == 20
    for i in range(20):
        assert r[i]["payload"] == bytes([i]) * 300


def test_mds_index_format(tmp_path):
    """index.json must carry the exact mosaicml-streaming schema fields."""
    d = tmp_path / "ds"
    with MDSWriter(out=str(d), columns={"x": "int32"}) as w:
        w.write({"x": 1})
    index = json.load(open(d / "index.json"))
    assert index["version"] == 2
    shard = index["shards"][0]
    for field in ("column_encodings", "column_names", "column_sizes", "format",
                  "raw_data", "samples", "version"):
        assert field in shard
    assert shard["format"] == "mds"
    assert shard["column_sizes"] == [4]
    assert shard["raw_data"]["basename"] == "shard.00000.mds"


def test_merge_index(tmp_path):
    for rank in range(3):
        sub = tmp_path / str(rank)
        with MDSWriter(out=str(sub), columns={"x": "int32"}) as w:
            for i in range(5):
                w.write({"x": rank * 100 + i})
    merge_index(str(tmp_path))
    r = MDSReader(str(tmp_path))
    assert len(r) == 15
    vals = [r[i]["x"] for i in range(15)]
    assert vals == [0, 1, 2, 3, 4, 100, 101, 102, 103, 104, 200, 201, 202, 203, 204]


def test_loader_basic(tmp_path):
    write_latents_dataset(tmp_path / "a", n=32)
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, cap_drop_prob=0.0, num_epochs=1,
    )
    batches = list(dl)
    assert len(batches) == 4
    b = batches[0]
    assert b["image_latents"].shape == (8, 4, 32, 32)
    assert b["caption_latents"].shape == (8, 1, 8, 16)
    assert b["image_latents"].dtype == np.float16
    assert b["drop_caption_mask"].shape == (8,)


def test_loader_block_shuffle_locality(tmp_path):
    """shuffle_algo='block' (VERDICT.md weak #6): a full permutation whose reads stay
    inside contiguous blocks (shard-locality, mosaicml-streaming semantics), still
    deterministic per (seed, epoch)."""
    write_latents_dataset(tmp_path / "a", n=64)
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, num_epochs=1, shuffle_algo="block", shuffle_block_size=16,
    )
    order = dl._epoch_order(epoch=0)
    # a real permutation of the dataset
    assert sorted(order.tolist()) == list(range(64))
    # every aligned 16-sample segment of the order covers exactly one block range
    for seg in range(4):
        vals = order[seg * 16 : (seg + 1) * 16]
        assert vals.max() - vals.min() < 16, (seg, vals)
        assert vals.min() % 16 == 0
    # deterministic per (seed, epoch), different across epochs
    np.testing.assert_array_equal(order, dl._epoch_order(epoch=0))
    assert not np.array_equal(order, dl._epoch_order(epoch=1))
    # and the loader still yields all samples exactly once
    seen = []
    for b in dl:
        seen.append(b["image_latents"])
    assert sum(x.shape[0] for x in seen) == 64


def test_loader_512_path(tmp_path):
    write_latents_dataset(tmp_path / "a", n=8)
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=4, image_size=512, cap_seq_size=8,
        cap_emb_dim=16, num_epochs=1,
    )
    b = next(iter(dl))
    assert b["image_latents"].shape == (4, 4, 64, 64)


def test_loader_multi_stream_mixing(tmp_path):
    write_latents_dataset(tmp_path / "a", n=10, seed=1)
    write_latents_dataset(tmp_path / "b", n=6, seed=2)
    dl = build_streaming_latents_dataloader(
        [str(tmp_path / "a"), str(tmp_path / "b")], batch_size=4, image_size=256,
        cap_seq_size=8, cap_emb_dim=16, num_epochs=1,
    )
    assert len(dl.dataset) == 16
    assert len(list(dl)) == 4


def test_loader_determinism_and_shuffle(tmp_path):
    write_latents_dataset(tmp_path / "a", n=32)
    mk = lambda: build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, seed=7, num_epochs=1,
    )
    b1 = [b["image_latents"] for b in mk()]
    b2 = [b["image_latents"] for b in mk()]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    # different epochs give different order
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, seed=7, num_epochs=2,
    )
    all_batches = [b["image_latents"] for b in dl]
    assert not np.array_equal(all_batches[0], all_batches[4])


def test_loader_per_host_partition_consistency(tmp_path):
    """Two hosts' per-step batches concatenated must equal the single-host batch."""
    write_latents_dataset(tmp_path / "a", n=32)
    kw = dict(image_size=256, cap_seq_size=8, cap_emb_dim=16, seed=7, num_epochs=1)
    single = list(
        build_streaming_latents_dataloader(str(tmp_path / "a"), batch_size=8, **kw)
    )
    h0 = list(
        build_streaming_latents_dataloader(
            str(tmp_path / "a"), batch_size=4, process_index=0, process_count=2, **kw
        )
    )
    h1 = list(
        build_streaming_latents_dataloader(
            str(tmp_path / "a"), batch_size=4, process_index=1, process_count=2, **kw
        )
    )
    assert len(single) == len(h0) == len(h1)
    for s, a, b in zip(single, h0, h1):
        np.testing.assert_array_equal(
            s["image_latents"],
            np.concatenate([a["image_latents"], b["image_latents"]]),
        )


def test_loader_resume(tmp_path):
    write_latents_dataset(tmp_path / "a", n=32)
    kw = dict(image_size=256, cap_seq_size=8, cap_emb_dim=16, seed=7)
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, num_epochs=1, **kw
    )
    it = iter(dl)
    next(it)
    next(it)
    state = dl.state_dict()
    rest = [b["image_latents"] for b in it]

    dl2 = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=8, num_epochs=1, **kw
    )
    dl2.load_state_dict(state)
    resumed = [b["image_latents"] for b in dl2]
    assert len(rest) == len(resumed) == 2
    for x, y in zip(rest, resumed):
        np.testing.assert_array_equal(x, y)


def test_caption_drop_stats(tmp_path):
    write_latents_dataset(tmp_path / "a", n=32)
    dl = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=32, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, cap_drop_prob=0.5, shuffle=False, num_epochs=4,
    )
    masks = np.concatenate([b["drop_caption_mask"] for b in dl])
    frac = 1.0 - masks.mean()
    assert 0.3 < frac < 0.7  # ~0.5 drop rate
    # deterministic per (seed, epoch, index)
    dl2 = build_streaming_latents_dataloader(
        str(tmp_path / "a"), batch_size=32, image_size=256, cap_seq_size=8,
        cap_emb_dim=16, cap_drop_prob=0.5, shuffle=False, num_epochs=4,
    )
    masks2 = np.concatenate([b["drop_caption_mask"] for b in dl2])
    np.testing.assert_array_equal(masks, masks2)


def test_jpeg_encoding_round_trip(tmp_path):
    from PIL import Image

    d = tmp_path / "img"
    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    )
    with MDSWriter(out=str(d), columns={"jpg": "jpeg", "caption": "str"}) as w:
        w.write({"jpg": img, "caption": "x"})
    out = MDSReader(str(d))[0]
    assert out["jpg"].size == (32, 32)
