"""ctypes loader for the native MDS gather core (_native/mds_gather.cpp).

Compiled on first use with g++ into a per-user cache dir; every caller has a pure-
Python fallback, so the native path is a transparent accelerator (pybind11 is not in
this toolchain - plain C ABI + ctypes instead).
"""

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import List, Optional, Sequence

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

_SRC = os.path.join(os.path.dirname(__file__), "_native", "mds_gather.cpp")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "micro_diffusion_tpu"
            )
            os.makedirs(cache, exist_ok=True)
            so_path = os.path.join(cache, f"mds_gather_{digest}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.mds_gather.restype = ctypes.c_long
            lib.mds_gather.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_long,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # no compiler / build failure -> fallback
            print(f"[mds native] falling back to Python gather: {e}", file=sys.stderr)
            _failed = True
        return _lib


def available() -> bool:
    return _build_and_load() is not None


def gather(
    paths: Sequence[str],
    file_offsets: Sequence[int],
    lengths: Sequence[int],
    num_threads: int = 8,
) -> Optional[List[bytes]]:
    """Gather n byte ranges in parallel. Returns list of bytes, or None if the native
    core is unavailable (caller falls back to Python)."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(paths)
    lengths_arr = np.asarray(lengths, np.int64)
    out_offsets = np.zeros(n, np.int64)
    np.cumsum(lengths_arr[:-1], out=out_offsets[1:])
    total = int(lengths_arr.sum())
    out = np.empty(total, np.uint8)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_foff = np.asarray(file_offsets, np.int64)
    ret = lib.mds_gather(
        c_paths,
        c_foff.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        lengths_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n,
        out.ctypes.data_as(ctypes.c_char_p),
        num_threads,
    )
    if ret < 0:
        raise OSError(-ret, f"mds_gather failed: {os.strerror(-int(ret))}")
    blobs = []
    for i in range(n):
        lo = int(out_offsets[i])
        blobs.append(out[lo : lo + int(lengths_arr[i])].tobytes())
    return blobs
