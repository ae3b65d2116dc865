"""ctypes bindings for the native C++ host kernels (neighbor search).

Builds xequinet_tpu/native/neighborlist.cpp with g++ on first use (cached
.so next to the source); transparently falls back to the numpy
implementations in ops/radius_graph.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SRC = _NATIVE_DIR / "neighborlist.cpp"
_SO = _NATIVE_DIR / "libxeqnative.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_SO))
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                str(_SRC),
                "-o",
                str(_SO),
            ],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(str(_SO))
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.xeq_radius_graph.restype = ctypes.c_int64
                lib.xeq_radius_graph.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int64,
                    ctypes.c_double,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                ]
                lib.xeq_radius_graph_pbc.restype = ctypes.c_int64
                lib.xeq_radius_graph_pbc.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_double,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                ]
            _lib = lib
    return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def radius_graph_native(
    pos: np.ndarray, cutoff: float
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Cell-list non-PBC neighbor search; None when native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n = pos.shape[0]
    cap = max(64, n * 64)
    while True:
        edges = np.empty(2 * cap, dtype=np.int64)
        found = lib.xeq_radius_graph(_dptr(pos), n, float(cutoff), _iptr(edges), cap)
        if found <= cap:
            break
        cap = int(found) + 16
    ei = np.stack([edges[:found], edges[cap : cap + found]])
    return ei, np.zeros((found, 3), dtype=np.float64)


def radius_graph_pbc_native(
    pos: np.ndarray,
    cell: np.ndarray,
    reps: np.ndarray,
    cutoff: float,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """PBC image-loop search on wrapped positions; returns (edge_index,
    integer offsets) or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    reps = np.ascontiguousarray(reps, dtype=np.int64)
    n = pos.shape[0]
    cap = max(64, n * 80)
    while True:
        edges = np.empty(2 * cap, dtype=np.int64)
        offs = np.empty(3 * cap, dtype=np.int64)
        found = lib.xeq_radius_graph_pbc(
            _dptr(pos), n, _dptr(cell), _iptr(reps), float(cutoff),
            _iptr(edges), _iptr(offs), cap,
        )
        if found <= cap:
            break
        cap = int(found) + 16
    ei = np.stack([edges[:found], edges[cap : cap + found]])
    return ei, offs[: 3 * found].reshape(found, 3).copy()
