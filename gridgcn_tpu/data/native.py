"""ctypes bindings for the native host runtime (native/batcher.cpp).

The reference's data iterator is single-threaded host Python (SURVEY §3.1);
gridgcn_tpu moves per-point math on device and keeps only batch assembly on
the host — this module makes that assembly multithreaded C++. Falls back to
NumPy when the shared library hasn't been built (`make -C native`), so the
framework works everywhere and merely gets faster with the native lib.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libgridgcn_native.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gg_gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    lib.gg_sample_points_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.gg_label_histogram.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64)]
    lib.gg_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(force: bool = False) -> bool:
    """Best-effort `make -C native`; returns availability."""
    if available() and not force:
        return True
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True)
    except Exception:
        return False
    global _lib
    _lib = None
    return available()


def _check_idx(idx: np.ndarray, n: int) -> None:
    """The C kernels memcpy blindly; validate here so the native path raises
    the same clean IndexError the NumPy fallback would (instead of reading
    out of bounds / segfaulting)."""
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= n):
        raise IndexError(
            f"index out of range for {n} rows: "
            f"[{int(idx.min())}, {int(idx.max())}]")


def gather_rows(src: np.ndarray, idx: np.ndarray, threads: int = 8
                ) -> np.ndarray:
    """out[i] = src[idx[i]] — batch assembly. src [S, ...], idx [B] int32."""
    idx = np.ascontiguousarray(idx, np.int32)
    src = np.ascontiguousarray(src)
    lib = _load()
    if lib is None:
        return np.take(src, idx, axis=0)
    _check_idx(idx, src.shape[0])
    out = np.empty((idx.shape[0],) + src.shape[1:], src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gg_gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.shape[0], row_bytes, out.ctypes.data_as(ctypes.c_void_p), threads)
    return out


def sample_points(src: np.ndarray, idx: np.ndarray, n_out: int,
                  seed: int = 0, threads: int = 8) -> np.ndarray:
    """out[i] = random n_out-point subset of cloud src[idx[i]].

    src [S, N, C] float32, idx [B] int32 → [B, n_out, C]. Without-replacement
    when n_out ≤ N (the ModelNet40 2048→1024 subsample, F-11).
    """
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    B, (S, N, C) = idx.shape[0], src.shape
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.empty((B, n_out, C), np.float32)
        for i in range(B):
            sel = rng.choice(N, n_out, replace=n_out > N)
            out[i] = src[idx[i]][sel]
        return out
    _check_idx(idx, S)
    out = np.empty((B, n_out, C), np.float32)
    lib.gg_sample_points_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, N, n_out, C, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads)
    return out


def label_histogram(labels: np.ndarray, num_classes: int) -> np.ndarray:
    labels = np.ascontiguousarray(labels.reshape(-1), np.int32)
    lib = _load()
    if lib is None:
        valid = (labels >= 0) & (labels < num_classes)
        return np.bincount(labels[valid], minlength=num_classes).astype(
            np.int64)
    out = np.zeros((num_classes,), np.int64)
    lib.gg_label_histogram(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.shape[0], num_classes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
