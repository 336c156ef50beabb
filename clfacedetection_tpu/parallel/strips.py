"""Intra-frame row-strip sharding: one frame's scan rows across chips.

The reference's CPU baseline parallelizes a SINGLE frame with TBB strips
— ``cv::parallel_for`` over window-row ranges of each scale
(tempcv.cpp:1305-1311,1323-1327) — while its GPU path is window-parallel
within one device.  This module is the TPU-native strip analog
(SURVEY.md section 2.3 "multicore strips" row): the packed canvas's scan
rows are split into ``mesh.size`` strips, each chip runs the dense front
stages + survivor compaction on its strip under ``jax.shard_map``, and
the per-strip fixed-size survivor buffers and vnf strips are exchanged
once over ICI.  The survivor tail then runs replicated — it is a few
percent of the pipeline, and replicating it avoids rebuilding the
band-layout tail kernels per strip height.

This is the *latency* axis of parallelism (one frame, k chips ~ k times
fewer front rows per chip), complementing ``runtime
.BatchedPyramidDetector``'s *throughput* axis (k frames, one per chip).
Candidate boxes come back in the same global raster order as the
single-device program: strips partition canvas rows in order and
compaction is raster-stable within a strip, so results are box-for-box
identical (tested on the virtual 8-device mesh).
"""

from __future__ import annotations

import inspect
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detect.pyramid import PyramidDetector, _compact_hier

__all__ = ["StripShardedPyramidDetector"]


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:                              # older jax spelling
        from jax.experimental.shard_map import shard_map
    kw = {}
    params = inspect.signature(shard_map).parameters
    # outputs are per-shard; replication checking must be off (the
    # kwarg was renamed check_rep -> check_vma across jax versions)
    for name in ("check_rep", "check_vma"):
        if name in params:
            kw[name] = False
            break
    return shard_map, kw


class StripShardedPyramidDetector:
    """Shard one PyramidDetector's front phase over canvas row strips.

    ``det.cap`` must be divisible by the mesh size (each strip compacts
    into a ``cap / k`` slice of the tail's survivor buffer, so the
    concatenated buffers feed the detector's existing tail program
    unchanged).  A strip whose true survivor count overflows its slice
    triggers the same grow-by-4x re-specialization as the single-device
    path (a strip can overflow before the global count would, since the
    per-strip budget is ``cap / k``; the regrow restores equality).
    """

    def __init__(self, det: PyramidDetector, mesh: Mesh,
                 axis_name: str = "strips"):
        if det.n_levels == 0:
            raise ValueError("detector has no pyramid levels")
        self.det = det
        self.mesh = mesh
        self.axis = axis_name
        if axis_name not in mesh.shape:
            raise ValueError(f"mesh has no axis {axis_name!r}: "
                             f"{dict(mesh.shape)}")
        self.k = int(mesh.shape[axis_name])
        if det.cap % self.k:
            raise ValueError(
                f"det.cap={det.cap} not divisible by mesh size {self.k}")
        Hv, Wv = det._visit.shape
        self.Hv, self.Wv = Hv, Wv
        # strip height: a multiple of the front tile height so the strip
        # kernel's grid is exact
        bh = det._kbh if det.use_pallas_front else 8
        Hs = -(-(-(-Hv // self.k)) // bh) * bh
        self.Hs = Hs
        # per-strip visit masks (numpy -> HLO literals / sharded operand)
        if det.use_pallas_front:
            bw = det._kbw
            wpad = -(-Wv // bw) * bw
        else:
            wpad = Wv
        vs = np.zeros((self.k, Hs, wpad), bool)
        for s in range(self.k):
            a = s * Hs
            if a < Hv:
                b = min(Hv, a + Hs)
                vs[s, :b - a, :Wv] = det._visit[a:b]
        self._visit_strips = vs
        self._vdev = None            # sharded device copy, made lazily
        if det.use_pallas_front:
            from ..ops.haar_front import build_front_kernel
            c = det.compiled
            self._front_strip = build_front_kernel(
                det.tables, c.spec, c.stage_threshold, det.front_k,
                det.h0, det.w0, det.equ_y, det.equ_x, det.inv_area,
                np.zeros((Hs, Wv), bool), c.has_tilted,
                bh=det._kbh, bw=det._kbw)
        self._progs = {}

    # ------------------------------------------------------------------
    def _build(self):
        det = self.det
        k, Hs, Hv, Wv = self.k, self.Hs, self.Hv, self.Wv
        cap_s = det.cap // k
        axis = self.axis
        shard_map, kw = _shard_map()
        n_flat = Hv * Wv
        extra = k * Hs - Hv          # strip overhang past the canvas
        rows = Hs + det._pad_y       # strip slice height (front halo)

        def strip_body(planes, sq_hi, sq_lo, vstrip):
            s = jax.lax.axis_index(axis)
            y0 = s * Hs

            def sl(a):
                return jax.lax.dynamic_slice(
                    a, (y0, jnp.zeros((), y0.dtype)), (rows, a.shape[1]))

            sp = {name: sl(v) for name, v in planes.items()}
            v = vstrip[0]
            if det.use_pallas_front:
                kp = dict(sp, sq_hi=sl(sq_hi), sq_lo=sl(sq_lo))
                front, vnf = self._front_strip(kp, v)
                front_flat = front.reshape(-1)
            else:
                o = det._front_from_planes(sp, sl(sq_hi), sl(sq_lo),
                                           shape=(Hs, Wv), visit=v)
                front_flat, vnf = o["front"], o["vnf"]
            idx, n_s = _compact_hier(front_flat, cap_s)
            # strip-local flat index -> global canvas-grid index (strips
            # are full-width row bands, so the offset is y0 * Wv); the
            # compaction sentinel (= Hs * Wv) maps to the global one
            gidx = jnp.where(idx < Hs * Wv,
                             idx.astype(jnp.int32) + jnp.int32(Wv) * y0,
                             jnp.int32(n_flat))
            return gidx[None], n_s.reshape(1), vnf[None]

        smap = shard_map(strip_body, mesh=self.mesh,
                         in_specs=(P(), P(), P(), P(axis)),
                         out_specs=(P(axis), P(axis), P(axis)), **kw)

        def run(gray, visit_strips):
            planes, sq_hi, sq_lo = det._prep_planes(gray)
            if extra > 0:
                def padr(a):
                    return jnp.pad(a, ((0, extra), (0, 0)))
                planes_p = {n: padr(v) for n, v in planes.items()}
                sq_hi_p, sq_lo_p = padr(sq_hi), padr(sq_lo)
            else:
                planes_p, sq_hi_p, sq_lo_p = planes, sq_hi, sq_lo
            gidx, n_s, vnf_strips = smap(planes_p, sq_hi_p, sq_lo_p,
                                         visit_strips)
            surv_idx = gidx.reshape(-1)              # [cap], raster order
            vnf = vnf_strips.reshape(k * Hs, Wv)[:Hv]
            n_total = jnp.sum(n_s)
            out = det._tail_device(planes, vnf, surv_idx, n_total)
            out["n_strip"] = n_s
            return out

        return jax.jit(run)

    # ------------------------------------------------------------------
    def candidates(self, gray) -> Tuple[np.ndarray, bool]:
        """Raw candidates (x, y, w, h), box-for-box equal to the wrapped
        detector's single-device ``candidates`` (same raster order)."""
        det = self.det
        prog = self._progs.get(det.cap)
        if prog is None:
            prog = self._progs[det.cap] = self._build()
        if self._vdev is None:
            self._vdev = jax.device_put(
                self._visit_strips, NamedSharding(self.mesh, P(self.axis)))
        vdev = self._vdev
        dev = prog(jnp.asarray(gray, jnp.uint8), vdev)
        n_strip = np.asarray(dev["n_strip"])
        while bool(np.any(n_strip > det.cap // self.k)) \
                and det.cap < self.k * det.n_visit:
            det.cap = -(-min(det.cap * 4, self.k * det.n_visit)
                        // self.k) * self.k
            prog = self._progs.get(det.cap)
            if prog is None:
                prog = self._progs[det.cap] = self._build()
            dev = prog(jnp.asarray(gray, jnp.uint8), vdev)
            n_strip = np.asarray(dev["n_strip"])
        overflow = bool(np.any(n_strip > det.cap // self.k))
        if "packed" in dev:
            packed = np.asarray(dev["packed"])       # ONE readback
            acap = (len(packed) - 2) // 2
            n_acc = int(packed[1])
            if n_acc <= acap:
                if n_acc == 0:
                    return np.zeros((0, 4), np.int32), overflow
                ay = packed[2:2 + n_acc]
                ax = packed[2 + acap:2 + acap + n_acc]
                return det.plan.boxes_for(ay, ax), overflow
        ok = np.asarray(dev["ok"])
        if not ok.any():
            return np.zeros((0, 4), np.int32), overflow
        return det.plan.boxes_for(np.asarray(dev["sy"])[ok],
                                  np.asarray(dev["sx"])[ok]), overflow

    def detect(self, gray, min_neighbors: int = 3):
        """Grouped detection (same post-processing as the detector)."""
        from ..detect.detector import DetectionResult
        from ..detect.grouping import group_rectangles

        cand, overflow = self.candidates(gray)
        if min_neighbors != 0:
            boxes, neigh = group_rectangles(cand, max(min_neighbors, 1),
                                            eps=0.2)
        else:
            boxes, neigh = cand, np.ones(len(cand), np.int32)
        return DetectionResult(boxes=boxes, neighbors=neigh,
                               candidates=cand,
                               survivor_overflow=overflow)
