"""ctypes bindings for the native mask-pipeline kernels (maskops.cpp).

The shared library is compiled on first use with g++ (-O3 -march=native) into
``_build/``; every entry point has a numpy fallback so the package works
without a toolchain.  See maskops.cpp for why this is native: the mask
pyramid runs per-sample on the host inside the loader, and the thinning loop
dominates with few input-pipeline cores.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_BUILD = _HERE / "_build"
_LIB_PATH = _BUILD / "libmaskops.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    _BUILD.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_HERE / "maskops.cpp"), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = (_HERE / "maskops.cpp").stat().st_mtime
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        c = ctypes.c_int
        lib.block_reduce_max_u8.argtypes = [u8p, u8p, c, c, c]
        lib.block_reduce_mean_u8.argtypes = [u8p, f32p, c, c, c]
        lib.zhang_suen_thin_u8.argtypes = [u8p, c, c, c]
        lib.rasterize_edges_u8.argtypes = [i32p, c, c, u8p, c, c]
        lib.close3x3_u8.argtypes = [u8p, u8p, c, c]
        _lib = lib
        return _lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def block_reduce_max(m: np.ndarray, k: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    m = np.ascontiguousarray(m, np.uint8)
    h, w = m.shape
    hc, wc = -(-h // k), -(-w // k)
    out = np.empty((hc, wc), np.uint8)
    lib.block_reduce_max_u8(_u8(m), _u8(out), h, w, k)
    return out


def block_reduce_mean(m: np.ndarray, k: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    m = np.ascontiguousarray(m, np.uint8)
    h, w = m.shape
    hc, wc = -(-h // k), -(-w // k)
    out = np.empty((hc, wc), np.float32)
    lib.block_reduce_mean_u8(_u8(m), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, k)
    return out


def zhang_suen_thin(m: np.ndarray, max_iters: int = 10000) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray((m > 0).astype(np.uint8))
    h, w = img.shape
    lib.zhang_suen_thin_u8(_u8(img), h, w, max_iters)
    return img.astype(bool)


def rasterize_edges(edges: np.ndarray, factor: int, out: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    edges = np.ascontiguousarray(edges, np.int32)
    out_c = np.ascontiguousarray(out)
    lib.rasterize_edges_u8(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(edges), factor, _u8(out_c), out.shape[0], out.shape[1],
    )
    out[...] = out_c
    return True


def close3x3(m: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    m = np.ascontiguousarray(m, np.uint8)
    out = np.empty_like(m)
    lib.close3x3_u8(_u8(m), _u8(out), m.shape[0], m.shape[1])
    return out
