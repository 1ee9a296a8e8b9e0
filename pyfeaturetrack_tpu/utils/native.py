"""Loader for the native (C++) host-side components.

The compute path is JAX/XLA/Pallas on the TPU; the runtime pieces that are
inherently host-sequential (greedy min-distance suppression) are C++,
compiled on demand with the system toolchain and loaded via ctypes
(no pybind11 in this environment). Falls back cleanly when no compiler
is available — callers must check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native"
_BUILD = Path(__file__).resolve().parent.parent.parent / "build"
_LIB_NAME = "libpft_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> Path | None:
    _BUILD.mkdir(exist_ok=True)
    out = _BUILD / _LIB_NAME
    src = _SRC / "min_distance.cpp"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("PFT_NO_NATIVE"):
            return None
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        fn = lib.pft_enforce_min_distance
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def enforce_min_distance(xs: np.ndarray, ys: np.ndarray, vals: np.ndarray,
                         order: np.ndarray, feats: np.ndarray,
                         shape: tuple[int, int], mindist: int,
                         min_eigenvalue: int, overwrite_all: bool
                         ) -> np.ndarray:
    """Native greedy suppression. ``feats`` (N,3) float64 is copied;
    returns the filled copy. Semantics identical to the NumPy path in
    ops/select.py (tested equal)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    nrows, ncols = shape
    out = np.ascontiguousarray(feats, dtype=np.float64).copy()
    fmap = np.zeros(nrows * ncols, np.uint8)
    lib.pft_enforce_min_distance(
        np.ascontiguousarray(xs, np.int64),
        np.ascontiguousarray(ys, np.int64),
        np.ascontiguousarray(vals, np.int64),
        np.ascontiguousarray(order, np.int64),
        np.int64(order.shape[0]),
        out, np.int64(out.shape[0]),
        np.int64(nrows), np.int64(ncols),
        np.int64(mindist), np.int64(min_eigenvalue),
        1 if overwrite_all else 0,
        fmap)
    return out
