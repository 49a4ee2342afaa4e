"""Pure-Python MDS shard format reader/writer.

Binary- and index-compatible with mosaicml-streaming's MDS format (the reference's data
interchange format for every dataset, SURVEY.md #2.3), so latent shards written by either
implementation are readable by the other:

    index.json: {"version": 2, "shards": [<shard-info>...]}
    shard file: uint32 num_samples
                uint32 offsets[num_samples + 1]   (absolute byte offsets)
                sample blobs
    sample:     uint32 sizes[<variable-size columns>] then encoded columns in order

Supported encodings: bytes, str, jpeg, png, int, int32, int64, uint32, float32, json.

The reader memory-maps shards and serves O(1) random access by global sample index;
`merge_index` reproduces streaming.base.util.merge_index for per-rank precompute output
dirs (reference prepare/*/precompute.py:242-248).
"""

import io
import json
import os
import struct
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

_FIXED = {
    "int": 8,
    "int64": 8,
    "int32": 4,
    "uint32": 4,
    "float32": 4,
}


def _encode(encoding: str, value: Any) -> bytes:
    if encoding == "bytes":
        return bytes(value)
    if encoding == "str":
        return str(value).encode("utf-8")
    if encoding == "json":
        return json.dumps(value).encode("utf-8")
    if encoding in ("int", "int64"):
        return struct.pack("<q", int(value))
    if encoding == "int32":
        return struct.pack("<i", int(value))
    if encoding == "uint32":
        return struct.pack("<I", int(value))
    if encoding == "float32":
        return struct.pack("<f", float(value))
    if encoding in ("jpeg", "png"):
        from PIL import Image

        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        assert isinstance(value, Image.Image), type(value)
        buf = io.BytesIO()
        value.save(buf, format="JPEG" if encoding == "jpeg" else "PNG", quality=95)
        return buf.getvalue()
    raise ValueError(f"unsupported MDS encoding: {encoding}")


def _decode(encoding: str, data: bytes) -> Any:
    if encoding == "bytes":
        return data
    if encoding == "str":
        return data.decode("utf-8")
    if encoding == "json":
        return json.loads(data.decode("utf-8"))
    if encoding in ("int", "int64"):
        return struct.unpack("<q", data)[0]
    if encoding == "int32":
        return struct.unpack("<i", data)[0]
    if encoding == "uint32":
        return struct.unpack("<I", data)[0]
    if encoding == "float32":
        return struct.unpack("<f", data)[0]
    if encoding in ("jpeg", "png"):
        from PIL import Image

        return Image.open(io.BytesIO(data))
    raise ValueError(f"unsupported MDS encoding: {encoding}")


class MDSWriter:
    """Writes MDS shards + index.json (mosaicml-streaming compatible).

    Matches the reference writer settings: no compression, size_limit in bytes
    (256MB in all prepare pipelines, e.g. jdb/precompute.py:168-175).
    """

    def __init__(
        self,
        out: str,
        columns: Dict[str, str],
        compression: Optional[str] = None,
        size_limit: int = 256 * (1 << 20),
        **_: Any,
    ):
        assert compression in (None, ""), "compression not supported"
        self.dirname = out
        os.makedirs(out, exist_ok=True)
        self.column_names = list(columns.keys())
        self.column_encodings = [columns[k] for k in self.column_names]
        self.column_sizes = [_FIXED.get(e) for e in self.column_encodings]
        self.size_limit = size_limit
        self._samples: List[bytes] = []
        self._bytes = 0
        self._shards: List[dict] = []
        self._finished = False

    def _encode_sample(self, sample: Dict[str, Any]) -> bytes:
        sizes = []
        data = []
        for name, enc, size in zip(
            self.column_names, self.column_encodings, self.column_sizes
        ):
            datum = _encode(enc, sample[name])
            if size is None:
                sizes.append(len(datum))
            else:
                assert len(datum) == size, (name, enc, size, len(datum))
            data.append(datum)
        head = np.array(sizes, np.uint32).tobytes()
        return head + b"".join(data)

    def write(self, sample: Dict[str, Any]) -> None:
        assert not self._finished
        blob = self._encode_sample(sample)
        if self._samples and self._bytes + len(blob) > self.size_limit:
            self._flush_shard()
        self._samples.append(blob)
        self._bytes += len(blob)

    def _flush_shard(self) -> None:
        if not self._samples:
            return
        n = len(self._samples)
        sizes = np.array([len(s) for s in self._samples], np.int64)
        header = 4 + 4 * (n + 1)
        offsets = (
            np.concatenate([np.zeros(1, np.int64), np.cumsum(sizes)]) + header
        ).astype(np.uint32)
        payload = (
            np.uint32(n).tobytes() + offsets.tobytes() + b"".join(self._samples)
        )
        basename = f"shard.{len(self._shards):05}.mds"
        path = os.path.join(self.dirname, basename)
        with open(path, "wb") as f:
            f.write(payload)
        self._shards.append(
            {
                "column_encodings": self.column_encodings,
                "column_names": self.column_names,
                "column_sizes": self.column_sizes,
                "compression": None,
                "format": "mds",
                "hashes": [],
                "raw_data": {
                    "basename": basename,
                    "bytes": len(payload),
                    "hashes": {},
                },
                "samples": n,
                "size_limit": self.size_limit,
                "version": 2,
                "zip_data": None,
            }
        )
        self._samples = []
        self._bytes = 0

    def finish(self) -> None:
        self._flush_shard()
        index = {"version": 2, "shards": self._shards}
        with open(os.path.join(self.dirname, "index.json"), "w") as f:
            json.dump(index, f)
        self._finished = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()


class MDSReader:
    """Random-access reader over one MDS dataset directory (index.json + shards)."""

    def __init__(self, dirname: str):
        self.dirname = dirname
        with open(os.path.join(dirname, "index.json")) as f:
            index = json.load(f)
        assert index.get("version") == 2, index.get("version")
        self.shards = index["shards"]
        self._cum = np.cumsum([0] + [s["samples"] for s in self.shards])
        self._mmaps: Dict[int, np.memmap] = {}

    def __len__(self) -> int:
        return int(self._cum[-1])

    def _shard_data(self, shard_idx: int) -> np.memmap:
        if shard_idx not in self._mmaps:
            basename = self.shards[shard_idx]["raw_data"]["basename"]
            path = os.path.join(self.dirname, basename)
            self._mmaps[shard_idx] = np.memmap(path, dtype=np.uint8, mode="r")
        return self._mmaps[shard_idx]

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if idx < 0:
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        shard_idx = int(np.searchsorted(self._cum, idx, side="right")) - 1
        local = idx - int(self._cum[shard_idx])
        shard = self.shards[shard_idx]
        data = self._shard_data(shard_idx)
        off = 4 + 4 * local
        begin, end = np.frombuffer(data[off : off + 8].tobytes(), np.uint32)
        blob = data[int(begin) : int(end)].tobytes()
        return self._decode_sample(shard, blob)

    @staticmethod
    def _decode_sample(shard: dict, blob: bytes) -> Dict[str, Any]:
        names = shard["column_names"]
        encodings = shard["column_encodings"]
        sizes = shard["column_sizes"]
        # head: uint32 size per variable-size column
        col_sizes = []
        pos = 0
        for s in sizes:
            if s is None:
                (sz,) = struct.unpack_from("<I", blob, pos)
                pos += 4
                col_sizes.append(sz)
            else:
                col_sizes.append(s)
        out = {}
        for name, enc, sz in zip(names, encodings, col_sizes):
            out[name] = _decode(enc, blob[pos : pos + sz])
            pos += sz
        return out

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(len(self)):
            yield self[i]

    # ------------------------------------------------------- batched native path

    def sample_range(self, idx: int):
        """(shard_path, shard_index, begin, length) of one sample's blob on disk."""
        shard_idx = int(np.searchsorted(self._cum, idx, side="right")) - 1
        local = idx - int(self._cum[shard_idx])
        data = self._shard_data(shard_idx)
        off = 4 + 4 * local
        begin, end = np.frombuffer(data[off : off + 8].tobytes(), np.uint32)
        path = os.path.join(
            self.dirname, self.shards[shard_idx]["raw_data"]["basename"]
        )
        return path, shard_idx, int(begin), int(end) - int(begin)

    def read_many(self, indices) -> List[Dict[str, Any]]:
        """Decode many samples; byte ranges are gathered by the native parallel-pread
        core when available (datasets/native.py), else via memmap."""
        from . import native

        ranges = [self.sample_range(int(i)) for i in indices]
        blobs = None
        if native.available() and len(ranges) >= 4:
            blobs = native.gather(
                [r[0] for r in ranges],
                [r[2] for r in ranges],
                [r[3] for r in ranges],
            )
        if blobs is None:
            blobs = []
            for path, shard_idx, begin, length in ranges:
                data = self._shard_data(shard_idx)
                blobs.append(data[begin : begin + length].tobytes())
        return [
            self._decode_sample(self.shards[r[1]], b)
            for r, b in zip(ranges, blobs)
        ]


def merge_index(root: str, subdirs: Optional[Sequence[str]] = None) -> None:
    """Merge per-rank sub-directory indexes into one root index.json, rewriting shard
    basenames as '<subdir>/<basename>' (streaming.base.util.merge_index parity;
    reference precompute.py:242-248)."""
    if subdirs is None:
        subdirs = sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
            and os.path.exists(os.path.join(root, d, "index.json"))
        )
    shards = []
    for sub in subdirs:
        with open(os.path.join(root, sub, "index.json")) as f:
            index = json.load(f)
        for s in index["shards"]:
            s = dict(s)
            rd = dict(s["raw_data"])
            rd["basename"] = os.path.join(sub, rd["basename"])
            s["raw_data"] = rd
            shards.append(s)
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump({"version": 2, "shards": shards}, f)
