"""ctypes bridge to the native batch-assembly engine (native/ffc_batcher.cpp).

Loads ``libffc_batcher.so`` when present (built with ``make -C native``;
built automatically on first use when a compiler is available) and exposes
the multithreaded gather+normalise path. Falls back to numpy silently —
everything works without the native library, just slower on large
image stores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libffc_batcher.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ffc_gather_normalize.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ffc_shuffle_indices.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        lib.ffc_normalize_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def gather_normalize(
    images: np.ndarray,
    indices: np.ndarray,
    hflip: bool = False,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Native gather+normalise; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert images.dtype == np.uint8 and images.ndim == 4
    assert images.flags["C_CONTIGUOUS"]
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    b = idx.shape[0]
    _, h, w, c = images.shape
    out = np.empty((b, h, w, c), np.float32)
    lib.ffc_gather_normalize(
        images.ctypes.data,
        idx.ctypes.data,
        b,
        h,
        w,
        c,
        out.ctypes.data,
        1 if hflip else 0,
        n_threads,
    )
    return out


def shuffle_indices(n: int, seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    idx = np.arange(n, dtype=np.int64)
    lib.ffc_shuffle_indices(idx.ctypes.data, n, seed)
    return idx
