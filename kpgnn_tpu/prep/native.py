"""ctypes bridge to the C++ preprocessing kernels.

Builds `khop_native.cpp` with g++ on first use (cached as a .so next to
the source) and exposes numpy-typed wrappers.  `available()` gates use;
`extract_khop` transparently prefers this path for graphs up to
`NATIVE_MAX_NODES` nodes when the library builds.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "khop_native.cpp")
_LIB = os.path.join(_HERE, "_native", "khop_native.so")

NATIVE_MAX_NODES = 4096

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    global _failed
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", _LIB + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        except (subprocess.SubprocessError, OSError):
            _failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.adjacency_powers.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64,
                                     _i64p]
    lib.spd_mask.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64, _i64p]
    lib.gd_union.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64, _i64p]
    lib.bfs_apsp.argtypes = [_u8p, ctypes.c_int64, ctypes.c_int64, _i32p]
    lib.peripheral_hop.argtypes = [_i64p, _i64p] + [ctypes.c_int64] * 5 + \
        [_i64p, _i64p]
    return lib


def available() -> bool:
    global _lib, _failed
    if _lib is not None:
        return True
    if _failed:
        return False
    with _lock:
        if _lib is None and not _failed:
            _lib = _build()
    return _lib is not None


def adjacency_powers(adj: np.ndarray, K: int) -> np.ndarray:
    n = adj.shape[0]
    out = np.empty((K, n, n), dtype=np.int64)
    _lib.adjacency_powers(np.ascontiguousarray(adj, np.int64), n, K, out)
    return out


def spd_mask(powers: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    K, n, _ = powers.shape
    powers = np.ascontiguousarray(powers, np.int64)
    union = np.empty((n, n), dtype=np.int64)
    _lib.spd_mask(powers, n, K, union)
    return powers, union


def gd_union(powers: np.ndarray) -> np.ndarray:
    K, n, _ = powers.shape
    union = np.empty((n, n), dtype=np.int64)
    _lib.gd_union(np.ascontiguousarray(powers, np.int64), n, K, union)
    return union


def bfs_apsp(adj_bool: np.ndarray, max_len: int) -> np.ndarray:
    n = adj_bool.shape[0]
    dist = np.empty((n, n), dtype=np.int32)
    _lib.bfs_apsp(np.ascontiguousarray(adj_bool, np.uint8), n, max_len, dist)
    return dist


def peripheral_hop(attr_adj: np.ndarray, hop_adj: np.ndarray,
                   max_hop_num: int, max_edge_type: int,
                   max_edge_count: int, max_distance_count: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    n = attr_adj.shape[0]
    edge_mat = np.empty((n, max_edge_type, 2), dtype=np.int64)
    config_mat = np.empty((n, max_hop_num + 1), dtype=np.int64)
    _lib.peripheral_hop(
        np.ascontiguousarray(attr_adj, np.int64),
        np.ascontiguousarray(hop_adj, np.int64),
        n, max_hop_num, max_edge_type, max_edge_count, max_distance_count,
        edge_mat, config_mat)
    return edge_mat, config_mat
