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

__all__ = ["native_available", "group_rectangles_native", "partition_native",
           "COracle"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "grouping.cpp"),
         os.path.join(_DIR, "haar_oracle.cpp")]
_LIB = os.path.join(_DIR, "libclfd_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB] + _SRCS,
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
                os.path.getmtime(_LIB) < max(os.path.getmtime(s)
                                             for s in _SRCS):
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
        c = ctypes
        i16p, i32p = c.POINTER(c.c_int16), c.POINTER(c.c_int32)
        f32p, f64p = c.POINTER(c.c_float), c.POINTER(c.c_double)
        u8p = c.POINTER(c.c_uint8)
        lib.clfd_oracle_create.restype = c.c_void_p
        lib.clfd_oracle_create.argtypes = [
            c.c_int, c.c_int, c.c_int, c.c_int,
            i16p, i16p, i16p, i16p, f32p, u8p, f32p, i32p, i32p,
            i32p, i32p, i32p, f32p,
            i32p, i32p, f32p, i32p, i32p, i32p,
            c.c_int, c.c_int]
        lib.clfd_oracle_set_images.restype = None
        lib.clfd_oracle_set_images.argtypes = [
            c.c_void_p, i32p, f64p, i32p, c.c_int, c.c_int, c.c_double]
        lib.clfd_oracle_run.restype = None
        lib.clfd_oracle_run.argtypes = [
            c.c_void_p, i32p, i32p, c.c_int, i32p, f64p]
        lib.clfd_oracle_destroy.restype = None
        lib.clfd_oracle_destroy.argtypes = [c.c_void_p]
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


class COracle:
    """Second, independent window-evaluation oracle (haar_oracle.cpp).

    Driven by the *raw* ``CascadeSpec`` arrays — the C side re-derives
    the hidden cascade (stage bias, third-rect drop), the per-scale
    corner/weight tables, and the run loop from the reference semantics
    (tempcv.cpp:549-948) independently of both ``models/compile.py`` and
    ``detect/reference_impl.py``, so it cross-checks them end to end.

    Returns the ``cvRunHaarClassifierCascadeSum`` contract: codes 1 pass,
    ``-i`` fail at stage i, 0 stage-tree fail, -1 out of bounds, plus the
    stage sum where evaluation stopped.
    """

    def __init__(self, spec):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        c = ctypes

        def arr(a, dt):
            a = np.ascontiguousarray(np.asarray(a, dt))
            return a

        # keep refs so the buffers outlive the create() copy window
        self._keep = k = dict(
            rx=arr(spec.rect_x, np.int16), ry=arr(spec.rect_y, np.int16),
            rw=arr(spec.rect_w, np.int16), rh=arr(spec.rect_h, np.int16),
            wgt=arr(spec.rect_weight, np.float32),
            tilt=arr(spec.tilted, np.uint8),
            thr=arr(spec.node_threshold, np.float32),
            left=arr(spec.left, np.int32), right=arr(spec.right, np.int32),
            cno=arr(spec.clf_node_ofs, np.int32),
            cnc=arr(spec.clf_node_cnt, np.int32),
            cao=arr(spec.clf_alpha_ofs, np.int32),
            al=arr(spec.alphas, np.float32),
            sco=arr(spec.stage_clf_ofs, np.int32),
            scc=arr(spec.stage_clf_cnt, np.int32),
            sth=arr(spec.stage_threshold, np.float32),
            sp=arr(spec.stage_parent, np.int32),
            sn=arr(spec.stage_next, np.int32),
            sc=arr(spec.stage_child, np.int32))

        def p(a, t):
            return a.ctypes.data_as(c.POINTER(t))

        self._h = lib.clfd_oracle_create(
            int(spec.n_stages), int(spec.n_classifiers), int(spec.n_nodes),
            len(k["al"]),
            p(k["rx"], c.c_int16), p(k["ry"], c.c_int16),
            p(k["rw"], c.c_int16), p(k["rh"], c.c_int16),
            p(k["wgt"], c.c_float), p(k["tilt"], c.c_uint8),
            p(k["thr"], c.c_float), p(k["left"], c.c_int32),
            p(k["right"], c.c_int32),
            p(k["cno"], c.c_int32), p(k["cnc"], c.c_int32),
            p(k["cao"], c.c_int32), p(k["al"], c.c_float),
            p(k["sco"], c.c_int32), p(k["scc"], c.c_int32),
            p(k["sth"], c.c_float), p(k["sp"], c.c_int32),
            p(k["sn"], c.c_int32), p(k["sc"], c.c_int32),
            int(spec.window_w), int(spec.window_h))
        self._imgs = None

    def set_images(self, sum_img, sqsum_img, tilted_img, scale):
        c = ctypes
        s = np.ascontiguousarray(sum_img, np.int32)
        q = np.ascontiguousarray(sqsum_img, np.float64)
        t = (np.ascontiguousarray(tilted_img, np.int32)
             if tilted_img is not None else s)
        self._imgs = (s, q, t)    # keep alive: C holds raw pointers
        self._lib.clfd_oracle_set_images(
            self._h, s.ctypes.data_as(c.POINTER(c.c_int32)),
            q.ctypes.data_as(c.POINTER(c.c_double)),
            t.ctypes.data_as(c.POINTER(c.c_int32)),
            int(s.shape[1]), int(s.shape[0]), float(scale))

    def run(self, xs, ys):
        assert self._imgs is not None, "call set_images first"
        c = ctypes
        xs = np.ascontiguousarray(xs, np.int32).ravel()
        ys = np.ascontiguousarray(ys, np.int32).ravel()
        n = len(xs)
        codes = np.empty(n, np.int32)
        sums = np.empty(n, np.float64)
        self._lib.clfd_oracle_run(
            self._h, xs.ctypes.data_as(c.POINTER(c.c_int32)),
            ys.ctypes.data_as(c.POINTER(c.c_int32)), n,
            codes.ctypes.data_as(c.POINTER(c.c_int32)),
            sums.ctypes.data_as(c.POINTER(c.c_double)))
        return codes, sums

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.clfd_oracle_destroy(self._h)
                self._h = None
        except Exception:
            pass
