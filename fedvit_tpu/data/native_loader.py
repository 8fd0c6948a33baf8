"""ctypes binding for the native C++ decode pool (native/fedvit_loader.cpp).

Replaces the reference's DataLoader worker processes (data.py:466-473) with
a GIL-free thread pool decoding straight into one contiguous batch buffer.
Falls back to the PIL path automatically when the .so hasn't been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libfedvit_loader.so",
    Path(os.environ.get("FEDVIT_LOADER_SO", "/nonexistent")),
]

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.fedvit_decode_jpeg_batch.restype = ctypes.c_int
            lib.fedvit_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int]
            lib.fedvit_decode_png_mask_batch.restype = ctypes.c_int
            lib.fedvit_decode_png_mask_batch.argtypes = \
                lib.fedvit_decode_jpeg_batch.argtypes
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[Optional[str]]):
    arr = (ctypes.c_char_p * len(paths))()
    for i, p in enumerate(paths):
        arr[i] = p.encode() if p is not None else None
    return arr


def decode_jpeg_batch(paths: Sequence[str], canvas: int,
                      threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs → ((N, canvas, canvas, 3) uint8, ok (N,) bool)."""
    lib = _load()
    assert lib is not None, "native loader not built (make -C native)"
    n = len(paths)
    out = np.zeros((n, canvas, canvas, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    lib.fedvit_decode_jpeg_batch(
        _paths_array(paths), n, canvas,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok.astype(bool)


def decode_png_mask_batch(paths: Sequence[Optional[str]], canvas: int,
                          threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Decode grayscale mask PNGs → ((N, canvas, canvas, 1) uint8, ok)."""
    lib = _load()
    assert lib is not None, "native loader not built (make -C native)"
    n = len(paths)
    out = np.zeros((n, canvas, canvas), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    lib.fedvit_decode_png_mask_batch(
        _paths_array(paths), n, canvas,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out[..., None], ok.astype(bool)
