"""Native C++ MDS gather core: build, correctness vs Python fallback, error paths, and
a small throughput sanity comparison."""

import os
import time

import numpy as np
import pytest

from micro_diffusion_tpu.datasets import MDSReader, MDSWriter
from micro_diffusion_tpu.datasets import native


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("native") / "ds"
    rng = np.random.default_rng(0)
    with MDSWriter(out=str(d), columns={"payload": "bytes"}, size_limit=50_000) as w:
        for i in range(200):
            w.write({"payload": rng.bytes(500 + i)})
    return str(d)


def test_native_builds():
    assert native.available(), "g++ build of mds_gather.cpp failed"


def test_gather_matches_python(dataset):
    r = MDSReader(dataset)
    idx = [0, 5, 199, 63, 64, 120, 7, 7]  # includes duplicate + cross-shard
    fast = r.read_many(idx)
    slow = [r[i] for i in idx]
    for a, b in zip(fast, slow):
        assert a["payload"] == b["payload"]


def test_gather_raw_ranges(dataset):
    r = MDSReader(dataset)
    paths, offs, lens = [], [], []
    expected = []
    for i in (3, 77, 150):
        path, shard, begin, length = r.sample_range(i)
        paths.append(path)
        offs.append(begin)
        lens.append(length)
        expected.append(r._shard_data(shard)[begin : begin + length].tobytes())
    blobs = native.gather(paths, offs, lens)
    assert blobs == expected


def test_gather_missing_file_errors():
    with pytest.raises(OSError):
        native.gather(["/nonexistent/file.mds"], [0], [10])


def test_gather_throughput_sanity(dataset):
    """Native path should not be slower than 2x the sequential python loop on a warm
    cache (it is typically faster; this is a regression floor, not a perf claim)."""
    r = MDSReader(dataset)
    idx = list(range(200)) * 5

    t0 = time.time()
    for _ in range(3):
        r.read_many(idx)
    native_t = time.time() - t0

    t0 = time.time()
    for _ in range(3):
        [r[i] for i in idx]
    python_t = time.time() - t0
    assert native_t < 2.0 * python_t + 0.5
