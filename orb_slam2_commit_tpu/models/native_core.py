"""ctypes bindings for the native C++ map-core (native/map_core.cpp).

Loads native/libmap_core.so (built by native/build.sh; auto-built on first
import when a compiler is available). Falls back to None when unavailable —
MapState keeps its NumPy implementations as the reference path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmap_core.so")

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "map_core.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.covis_row.argtypes = [
        _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _i32p,
    ]
    lib.obs_counts.argtypes = [
        _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p,
    ]
    lib.covis_matrix.argtypes = [
        _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p,
    ]
    _LIB = lib
    return _LIB


def covis_row(kf_point_idx: np.ndarray, kf_valid: np.ndarray,
              max_points: int, k: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    K, N = kf_point_idx.shape
    out = np.zeros(K, np.int32)
    lib.covis_row(
        np.ascontiguousarray(kf_point_idx, np.int32),
        np.ascontiguousarray(kf_valid, np.uint8),
        K, N, max_points, k, out,
    )
    return out


def obs_counts(kf_point_idx: np.ndarray, kf_valid: np.ndarray,
               max_points: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    K, N = kf_point_idx.shape
    out = np.zeros(max_points, np.int32)
    lib.obs_counts(
        np.ascontiguousarray(kf_point_idx, np.int32),
        np.ascontiguousarray(kf_valid, np.uint8),
        K, N, max_points, out,
    )
    return out


def covis_matrix(kf_point_idx: np.ndarray, kf_valid: np.ndarray,
                 max_points: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    K, N = kf_point_idx.shape
    out = np.zeros((K, K), np.int32)
    lib.covis_matrix(
        np.ascontiguousarray(kf_point_idx, np.int32),
        np.ascontiguousarray(kf_valid, np.uint8),
        K, N, max_points, out,
    )
    return out
