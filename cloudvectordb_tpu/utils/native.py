"""ctypes bridge to the native host-side data plane (native/arena_sort.cpp).

Compiled lazily with g++ on first use into a repo-local build dir; every entry
point has a numpy fallback so the framework runs on machines without a
toolchain. pybind11 is unavailable in this environment, hence the C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

from cloudvectordb_tpu.utils.metrics import get_logger

log = get_logger("cvdb.native")

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "arena_sort.cpp"
_BUILD = _REPO / "native" / "build"  # gitignored: binaries are never committed
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        # cache key = source-content hash: mtime is unreliable after a clone
        # (git doesn't preserve it) and a stale/non-portable blob must never
        # be loaded over the checked-in source.
        src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
        lib_path = _BUILD / f"libarena_sort.{src_hash}.so"
        if not lib_path.exists():
            _BUILD.mkdir(parents=True, exist_ok=True)
            tmp = lib_path.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True,
            )
            tmp.replace(lib_path)  # atomic: concurrent loaders see whole files
        lib = ctypes.CDLL(str(lib_path))
        lib.arena_sort.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gather_rows.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception as e:  # no toolchain / build failure → numpy fallback
        log.warning("native arena_sort unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def arena_sort(assign: np.ndarray, nlist: int) -> tuple[np.ndarray, np.ndarray]:
    """Stable sort-by-list: returns (order (n,) i64, offsets (nlist+1,) i64)."""
    assign = np.ascontiguousarray(assign, np.int32)
    n = assign.shape[0]
    lib = _load()
    if lib is None:
        order = np.argsort(assign, kind="stable").astype(np.int64)
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return order, offsets
    order = np.empty(n, np.int64)
    offsets = np.empty(nlist + 1, np.int64)
    lib.arena_sort(
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_int32(nlist),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order, offsets


def gather_rows(src: np.ndarray, order: np.ndarray) -> np.ndarray:
    """dst[i] = src[order[i]] — parallel row gather for arena payloads."""
    src = np.ascontiguousarray(src)
    order = np.ascontiguousarray(order, np.int64)
    lib = _load()
    if lib is None:
        return src[order]
    out = np.empty((order.shape[0], *src.shape[1:]), src.dtype)
    row_bytes = src.itemsize * int(np.prod(src.shape[1:], initial=1))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(order.shape[0]), ctypes.c_int64(row_bytes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
