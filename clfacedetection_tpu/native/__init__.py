"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime around the device kernels is C++ (clif.cpp /
clod.cpp hosts); this package plays the same role for the host-sequential
pieces of the TPU framework.  Components are compiled on demand with the
system toolchain and cached next to the sources; every native entry point
has a NumPy twin in pure Python that serves as the behavioral
specification, the test oracle, and the fallback when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "group_rectangles_native", "partition_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "grouping.cpp")
_LIB = os.path.join(_DIR, "libclfd_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.clfd_partition.restype = ctypes.c_int
        lib.clfd_partition.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32)]
        lib.clfd_group_rectangles.restype = ctypes.c_int
        lib.clfd_group_rectangles.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_i64(boxes: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(boxes, np.int64).reshape(-1, 4))


def partition_native(boxes: np.ndarray,
                     eps: float) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    b = _as_i64(boxes)
    n = len(b)
    labels = np.empty(n, np.int32)
    ncls = lib.clfd_partition(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        float(eps), labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(ncls)


def group_rectangles_native(boxes: np.ndarray, group_threshold: int,
                            eps: float = 0.2, variant: str = "opencv"
                            ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    b = _as_i64(boxes)
    n = len(b)
    out_b = np.empty((max(n, 1), 4), np.int64)
    out_n = np.empty(max(n, 1), np.int32)
    m = lib.clfd_group_rectangles(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        int(group_threshold), float(eps),
        1 if variant == "clod" else 0,
        out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out_b[:m].astype(np.int32), out_n[:m]
