"""TPU-native multi-scale Haar-cascade detector (scale-cascade mode).

This is the framework's re-design of the reference's detection engine
(``clodDetectObjects`` + its OpenCL kernel ``runStage``, clod.cpp:1176-1500,
clod.cl:32-93) and of OpenCV's ``cvHaarDetectObjectsForROC`` scale-cascade
driver (tempcv.cpp:1330-1456).  Where the reference crosses the host<->device
boundary >1,000 times per frame (a write + sync per stage per scale,
SURVEY.md section 3.3), here the *entire* multi-scale detection is ONE
compiled XLA program:

    integral images -> lax.scan over pyramid scales ->
        dense front-stage evaluation        (shifted dynamic slices; VPU)
     -> fixed-size survivor compaction      (replaces atom_inc worklists,
                                             clod.cl:85-91, with static shapes)
     -> chunked tail-stage evaluation       (gathers over survivors)
     -> visit-set computation               (associative scan; reproduces the
                                             reference's skip-by-2 rule)
     -> per-scale padded survivor buffers

Key TPU-first choices (SURVEY.md sections 2.3 and 7):

* **No per-window control flow.**  The reference early-exits each window as
  soon as a stage fails (clod.cpp:736-787).  Dense masked evaluation of a
  *static* front-stage prefix plays that role: >95% of windows die there,
  and only compacted survivors pay for the remaining stages.
* **Dense front stages use slices, not gathers.**  A Haar rect sum at every
  window position simultaneously is 4 shifted copies of the integral image
  (``I[dy:dy+H, dx:dx+W]``) — pure vector adds with no index
  materialization.  Per-scale corner offsets arrive as traced scalars
  through ``lax.scan``, so one compiled program serves every pyramid level.
* **Worklists become fixed-size compaction.**  The reference ping-pongs
  atomically-appended survivor lists between stages (clod.cpp:1288-1299).
  Here one ``nonzero(size=CAP)`` compaction after the front prefix gives a
  static-shape survivor buffer; overflow is detected and reported.
* **Sequential scan semantics become an associative scan.**  The reference
  scanner advances x by 2 after a stage-0 reject (``ixstep = result != 0 ?
  1 : 2``, tempcv.cpp:1163).  The visited set is the orbit of a 2-state
  automaton over the reject bits; its transition functions compose
  associatively, so the exact visit set comes from
  ``lax.associative_scan`` instead of a serial loop.

Detection parity: box-for-box vs ``detect.reference_impl`` (the NumPy
golden implementing the OpenCV 2.4 semantics) in float64 mode; float32
mode trades bit-exact vote thresholds for TPU speed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.compile import (
    CompiledCascade, compile_cascade, cv_round, scale_factors, scan_grid,
    truncate_cascade)
from ..models.spec import CascadeSpec
from ..ops.integral import integral_images
from .grouping import group_rectangles

__all__ = ["ScaleCascadeDetector", "DetectionResult"]


def _stage_paths(c: CompiledCascade) -> List[List[int]]:
    """Root-to-leaf stage chains of the stage tree (tempcv.cpp:834-861).

    A window is accepted iff every stage on some root-to-leaf path passes;
    sibling order only affects which accepting path the reference's DFS
    finds first, not acceptance, so path-mask evaluation is exact.  Plain
    cascades are the single chain [0..n_stages-1].
    """
    n = c.spec.n_stages
    if not c.is_tree:
        return [list(range(n))]
    children: List[List[int]] = [[] for _ in range(n)]
    roots: List[int] = []
    for s in range(n):
        p = int(c.stage_parent[s])
        if p == -1:
            roots.append(s)
        else:
            children[p].append(s)
    paths: List[List[int]] = []

    def walk(s: int, prefix: List[int]) -> None:
        prefix = prefix + [s]
        if int(c.stage_child[s]) == -1:
            paths.append(prefix)
        else:
            for ch in children[s]:
                walk(ch, prefix)

    # The DFS enters at stage 0 and can move to any root-level sibling on
    # failure, so every root chain contributes paths.
    for r in roots:
        walk(r, [])
    return paths


@dataclasses.dataclass(frozen=True)
class _ClfTables:
    """Classifier-major padded tables. T = max nodes per classifier
    (1 for stump cascades; the zoo's CART cascades are uniformly 2 or 3)."""

    T: int
    n_clf: int
    corner_y: np.ndarray   # int32 [S, n_clf, T, 3, 4]
    corner_x: np.ndarray   # int32 [S, n_clf, T, 3, 4]
    weight: np.ndarray     # float32 [S, n_clf, T, 3]
    use_tilted: np.ndarray  # bool [n_clf, T]
    threshold: np.ndarray  # float32 [n_clf, T]
    left: np.ndarray       # int32 [n_clf, T]
    right: np.ndarray      # int32 [n_clf, T]
    alpha: np.ndarray      # float32 [n_clf, T + 1]
    clf_stage: np.ndarray  # int32 [n_clf]
    clf_valid_nodes: np.ndarray  # int32 [n_clf]


def _build_clf_tables(c: CompiledCascade,
                      scales: Sequence[float]) -> _ClfTables:
    spec = c.spec
    n_clf = spec.n_classifiers
    T = int(spec.clf_node_cnt.max()) if n_clf else 1
    S = len(scales)
    cy = np.zeros((S, n_clf, T, 3, 4), np.int32)
    cx = np.zeros((S, n_clf, T, 3, 4), np.int32)
    w = np.zeros((S, n_clf, T, 3), np.float32)
    tlt = np.zeros((n_clf, T), bool)
    thr = np.zeros((n_clf, T), np.float32)
    left = np.zeros((n_clf, T), np.int32)
    right = np.zeros((n_clf, T), np.int32)
    alpha = np.zeros((n_clf, T + 1), np.float32)
    clf_stage = np.zeros((n_clf,), np.int32)
    nodesel = []  # flat node index per (clf, t), -1 for padding
    for cidx in range(n_clf):
        n0 = int(spec.clf_node_ofs[cidx])
        cnt = int(spec.clf_node_cnt[cidx])
        a0 = int(spec.clf_alpha_ofs[cidx])
        for t in range(cnt):
            node = n0 + t
            thr[cidx, t] = c.node_threshold[node]
            left[cidx, t] = c.left[node]
            right[cidx, t] = c.right[node]
            tlt[cidx, t] = c.use_tilted[node]
        alpha[cidx, :cnt + 1] = spec.alphas[a0:a0 + cnt + 1]
        nodesel.append([n0 + t if t < cnt else -1 for t in range(T)])
    for stage in range(spec.n_stages):
        c0 = int(spec.stage_clf_ofs[stage])
        clf_stage[c0:c0 + int(spec.stage_clf_cnt[stage])] = stage
    sel = np.asarray(nodesel, np.int64)  # [n_clf, T]
    valid = sel >= 0
    selc = np.clip(sel, 0, None)
    for k, s in enumerate(scales):
        sc = c.at_scale(s)
        cy[k] = np.where(valid[..., None, None], sc.corner_y[selc], 0)
        cx[k] = np.where(valid[..., None, None], sc.corner_x[selc], 0)
        w[k] = np.where(valid[..., None], sc.weight[selc], 0.0)
    return _ClfTables(
        T=T, n_clf=n_clf, corner_y=cy, corner_x=cx, weight=w,
        use_tilted=tlt, threshold=thr, left=left, right=right, alpha=alpha,
        clf_stage=clf_stage,
        clf_valid_nodes=spec.clf_node_cnt.astype(np.int32))


@dataclasses.dataclass
class DetectionResult:
    """Detections plus diagnostics."""

    boxes: np.ndarray          # int32 [n, 4] grouped (raw if min_neighbors=0)
    neighbors: np.ndarray      # int32 [n]
    candidates: np.ndarray     # int32 [m, 4] raw pre-grouping candidates
    survivor_overflow: bool    # True if any scale overflowed the cap


class ScaleCascadeDetector:
    """Compiled multi-scale detector for one (cascade, image shape) pair.

    Parameters mirror ``cvHaarDetectObjects`` (tempcv.hpp:141-145): the
    pyramid is ``scale_factor``-spaced, ``min_size`` filters scales and
    ``min_neighbors`` drives grouping.  ``front_stages``, ``cap`` and
    ``clf_chunk`` are TPU execution knobs — the moral equivalents of the
    reference's ``clod_flags`` execution-strategy bitmask (clod.h:17-21).
    """

    def __init__(self, spec: CascadeSpec, image_shape: Tuple[int, int],
                 scale_factor: float = 1.1,
                 min_size: Tuple[int, int] = (0, 0),
                 max_size: Optional[Tuple[int, int]] = None,
                 front_stages: Optional[int] = None,
                 cap: Optional[int] = None,
                 dtype=jnp.float32,
                 clf_chunk: int = 256,
                 max_stages: Optional[int] = None,
                 do_canny_pruning: bool = False,
                 device: Optional[str] = None,
                 strategy: Optional[str] = None):
        if strategy not in (None, "per_stage", "block", "direct"):
            raise ValueError(f"unknown strategy {strategy!r}")
        # "per_stage" (default): staged tail groups with compaction;
        # "block"/"direct": one all-stages evaluation (no staging) —
        # this mode has no Pallas stencil kernel (windows exceed the
        # 32-lane patch gate at every scale-cascade scale), so the two
        # non-staged flavors coincide
        self.strategy = strategy
        self.spec = spec
        self.H, self.W = int(image_shape[0]), int(image_shape[1])
        self.dtype = dtype
        c = compile_cascade(spec)
        if max_stages is not None:
            c = truncate_cascade(c, max_stages)
        self.compiled = c
        self.scales = scale_factors(
            spec.window_w, spec.window_h, self.W, self.H, scale_factor,
            min_size, max_size, mode="scale_cascade")
        self.n_scales = len(self.scales)
        self.is_tree = c.is_tree
        self.do_canny_pruning = bool(do_canny_pruning)
        self.paths = _stage_paths(c)
        self.n_stages = c.spec.n_stages
        if front_stages is None:
            # TPU default: evaluate EVERY stage as a dense per-scale map,
            # removing the gather tail entirely.  Scale-cascade windows
            # are 43+ px wide (no VMEM band kernel possible), so the tail
            # is element-rate-bound XLA gathers (~0.27 G elem/s) and
            # dominates: measured VGA full depth 30.9 s/frame at front 3
            # vs 1.98 s at front n_stages, box-for-box identical
            # (scripts/prof_sc_sweep.py, round 4).  The one-off compile of
            # the all-stages shared program is minutes (persistent-cached);
            # front 3 remains the CPU default, where dense maps are the
            # expensive side.
            front_stages = (self.n_stages
                            if jax.default_backend() == "tpu" else 3)
        self.front_k = max(1, min(front_stages, self.n_stages))
        if self.n_scales == 0:
            return

        # ---- per-scale static geometry ---------------------------------
        grids = [scan_grid(self.W, self.H, int(cv_round(spec.window_w * f)),
                           int(cv_round(spec.window_h * f)), f)
                 for f in self.scales]
        self.max_x = max(max((len(g[1]) for g in grids), default=1), 1)
        self.max_y = max(max((len(g[2]) for g in grids), default=1), 1)
        SENT = np.int32(1 << 28)
        xs_pos = np.full((self.n_scales, self.max_x), SENT, np.int32)
        ys_pos = np.full((self.n_scales, self.max_y), SENT, np.int32)
        for k, (_, gx, gy) in enumerate(grids):
            xs_pos[k, :len(gx)] = gx
            ys_pos[k, :len(gy)] = gy

        self.tables = _build_clf_tables(c, self.scales)
        if jax.default_backend() == "tpu":
            # the per-scale tail gathers materialize [cap, clf_chunk,
            # T, 3, 4] s32 temps; at chunk 256 that is ~190MB per buffer
            # and the unrolled scale dispatches OOM HBM (measured)
            clf_chunk = min(clf_chunk, 32)
        self.clf_chunk = min(clf_chunk, max(self.tables.n_clf, 1))
        lattice = self.max_x * self.max_y
        if cap is None:
            # >95% of windows die in the front prefix on natural images
            # (SURVEY.md section 7 hard-part #2); start small and let
            # ``candidates`` auto-grow on overflow.
            cap = int(2 ** np.ceil(np.log2(
                min(max(lattice // 16, 256), 8192))))
        self.cap = min(int(cap), lattice)

        sc_tables = [c.at_scale(f) for f in self.scales]
        self.win_w = np.array([t.win_w for t in sc_tables], np.int32)
        self.win_h = np.array([t.win_h for t in sc_tables], np.int32)

        # numpy on purpose — these become HLO literals inside the traced
        # program.  Capturing committed jax.Arrays instead (any size)
        # poisons this platform's dispatch path process-wide (~800x gather
        # slowdowns; see ops/haar_front.py note + docs/PERF.md).
        dev = np.asarray
        t = self.tables
        self._scan_xs = dict(
            corner_y=dev(t.corner_y), corner_x=dev(t.corner_x),
            weight=dev(t.weight),
            inv_area=dev(np.array([s.inv_area for s in sc_tables],
                                  np.float64).astype(np.dtype(dtype))),
            equ_y=dev(np.stack([s.equ_corner_y for s in sc_tables])),
            equ_x=dev(np.stack([s.equ_corner_x for s in sc_tables])),
            win_w=dev(self.win_w), win_h=dev(self.win_h),
            xs_pos=dev(xs_pos), ys_pos=dev(ys_pos),
        )
        if self.do_canny_pruning:
            # pruning rect corners (0.15/0.7 of the scaled window,
            # tempcv.cpp:1386-1391), order (+,-,-,+)
            cyy = np.zeros((self.n_scales, 4), np.int32)
            cxx = np.zeros((self.n_scales, 4), np.int32)
            for k in range(self.n_scales):
                ex = int(cv_round(self.win_w[k] * 0.15))
                ey = int(cv_round(self.win_h[k] * 0.15))
                ew = int(cv_round(self.win_w[k] * 0.7))
                eh = int(cv_round(self.win_h[k] * 0.7))
                cyy[k] = (ey, ey, ey + eh, ey + eh)
                cxx[k] = (ex, ex + ew, ex, ex + ew)
            self._scan_xs["canny_y"] = dev(cyy)
            self._scan_xs["canny_x"] = dev(cxx)
        self._consts = dict(
            threshold=dev(t.threshold),
            left=dev(t.left), right=dev(t.right),
            alpha=dev(t.alpha),
            clf_stage=dev(t.clf_stage),
            stage_threshold=dev(c.stage_threshold),
        )
        pm = np.zeros((len(self.paths), self.n_stages), bool)
        for i, p in enumerate(self.paths):
            pm[i, p] = True
        self._path_mask = pm
        self._pad = int(self.win_h.max() + self.win_w.max() + 4)
        # The lax.scan-over-scales program crashes the TPU runtime worker
        # at >=VGA sizes ('TPU worker process crashed or restarted',
        # reproduced 2026-08-17); on TPU the scale loop therefore runs as
        # per-scale jitted dispatches instead (_detect_unrolled).
        # device="cpu" forces the scan program on the host CPU.
        self._use_unrolled = (device != "cpu"
                              and jax.default_backend() == "tpu")
        self._exec_device = (jax.devices(device)[0] if device else None)
        self._jit_detect = jax.jit(self._detect_device)
        self._jit_prep = None
        self._jit_scales = {}
        self._scale_devices = None

    # ------------------------------------------------------------------
    def shard_scales(self, devices) -> "ScaleCascadeDetector":
        """Split the pyramid's scales across ``devices`` (round-robin).

        The scale-cascade analog of SURVEY.md section 2.3's
        "splitting pyramid scales across devices": the shared per-scale
        program (one jit cache entry, tables as runtime arguments) is
        dispatched with scale ``i``'s operands committed to
        ``devices[i % k]``, so the ~25 per-scale programs execute
        concurrently across the mesh instead of queueing on one chip.
        The integral planes are broadcast once per frame; each device
        packs its own scales and the host merges in scale order, so
        results are identical to the single-device path.  Enables the
        unrolled dispatch path on any backend (CPU tests use the
        virtual 8-device mesh)."""
        devs = list(devices)
        if not devs:
            raise ValueError("need at least one device")
        self._scale_devices = devs
        self._use_unrolled = True
        # the per-cap dispatch closures capture per-scale tables on
        # their build-time devices — invalidate anything built before
        # the split so the tables re-commit to the round-robin devices
        self._jit_scales = {}
        self._xs_dev = {}
        return self

    # ------------------------------------------------------------------
    # device program
    # ------------------------------------------------------------------

    def _rect_sum_map(self, img, oy, ox, shape):
        """Sum over one rect at every window position: 4 shifted slices."""
        def sl(dy, dx):
            return jax.lax.dynamic_slice(img, (dy, dx), shape)
        return (sl(oy[0], ox[0]) - sl(oy[1], ox[1])
                - sl(oy[2], ox[2]) + sl(oy[3], ox[3]))

    def _node_value_map(self, planes, xs, clf, t, shape):
        """Dense value map of one node over all window positions, summed in
        rect order like the oracle (tempcv.cpp:905-918)."""
        img = planes["tilted"] if self.tables.use_tilted[clf, t] \
            else planes["sum"]
        dtype = self.dtype
        v = None
        for k in range(3):
            if not np.any(self.tables.weight[:, clf, t, k] != 0.0):
                continue
            oy = [xs["corner_y"][clf, t, k, j] for j in range(4)]
            ox = [xs["corner_x"][clf, t, k, j] for j in range(4)]
            rs = self._rect_sum_map(img, oy, ox, shape).astype(dtype)
            term = rs * xs["weight"][clf, t, k].astype(dtype)
            v = term if v is None else v + term
        return v if v is not None else jnp.zeros(shape, dtype)

    def _classifier_value_map(self, planes, xs, clf, vnf, shape):
        """CART walk on dense maps (icvEvalHidHaarClassifier,
        tempcv.cpp:771-792), unrolled over the host-known tree links."""
        t_tab = self.tables
        dtype = self.dtype
        nvals = [self._node_value_map(planes, xs, clf, t, shape)
                 for t in range(int(t_tab.clf_valid_nodes[clf]))]

        def walk(t):
            thr = jnp.asarray(t_tab.threshold[clf, t]).astype(dtype)
            cond = nvals[t] < thr * vnf
            lf, rt = int(t_tab.left[clf, t]), int(t_tab.right[clf, t])
            lval = (jnp.full(shape, t_tab.alpha[clf, -lf], dtype)
                    if lf <= 0 else walk(lf))
            rval = (jnp.full(shape, t_tab.alpha[clf, -rt], dtype)
                    if rt <= 0 else walk(rt))
            return jnp.where(cond, lval, rval)

        return walk(0)

    def _per_scale(self, planes, xs, roi=None):
        """One scale's full evaluation.  ``roi`` (optional traced
        (start_y, end_y, start_x, end_x) lattice-index bounds,
        [start, end) like the reference's ScaleCascade invoker ranges)
        restricts the scan — the FIND_BIGGEST_OBJECT driver's shrinking
        scan ROI (tempcv.cpp:1408-1415)."""
        c = self.compiled
        spec = c.spec
        H, W = self.H, self.W
        shape = (H + 1, W + 1)
        dtype = self.dtype
        cap = self.cap
        stage_thr = self._consts["stage_threshold"]

        # ---- variance-normalization map (tempcv.cpp:822-832) -----------
        equ_y, equ_x = xs["equ_y"], xs["equ_x"]
        win_sum = self._rect_sum_map(planes["sum"], equ_y, equ_x,
                                     shape).astype(dtype)
        sq_hi = self._rect_sum_map(planes["sq_hi"], equ_y, equ_x,
                                   shape).astype(dtype)
        sq_lo = self._rect_sum_map(planes["sq_lo"], equ_y, equ_x,
                                   shape).astype(dtype)
        win_sq = sq_hi * jnp.asarray(256.0, dtype) + sq_lo
        inv_area = xs["inv_area"].astype(dtype)
        mean = win_sum * inv_area
        var = win_sq * inv_area - mean * mean
        vnf = jnp.where(var >= 0, jnp.sqrt(jnp.maximum(var, 0)),
                        jnp.ones_like(var))

        # ---- dense front-stage maps -------------------------------------
        stage_pass = []
        for st in range(self.front_k):
            c0 = int(spec.stage_clf_ofs[st])
            cnt = int(spec.stage_clf_cnt[st])
            ssum = jnp.zeros(shape, dtype)
            for j in range(cnt):
                ssum = ssum + self._classifier_value_map(
                    planes, xs, c0 + j, vnf, shape)
            stage_pass.append(ssum >= stage_thr[st].astype(dtype))
        fail0 = ~stage_pass[0]
        if self.is_tree:
            fp = jnp.zeros(shape, bool)
            for pth in self.paths:
                acc = jnp.ones(shape, bool)
                for st in pth:
                    if st < self.front_k:
                        acc = acc & stage_pass[st]
                fp = fp | acc
            front_possible = fp
        else:
            front_possible = functools.reduce(jnp.logical_and, stage_pass)

        # ---- scan lattice ------------------------------------------------
        xs_pos, ys_pos = xs["xs_pos"], xs["ys_pos"]
        win_w, win_h = xs["win_w"], xs["win_h"]
        xc = jnp.clip(xs_pos, 0, W)
        yc = jnp.clip(ys_pos, 0, H)
        # boundary semantics: reject iff pt + real_window >= W+1
        # (tempcv.cpp:816-819), i.e. in-bounds iff x+winW <= W.
        inb = ((ys_pos[:, None] + win_h <= H)
               & (xs_pos[None, :] + win_w <= W))
        if roi is not None:
            sy0, sy1, sx0, sx1 = roi
            iy = jnp.arange(self.max_y)
            ixr = jnp.arange(self.max_x)
            inb = inb & ((iy[:, None] >= sy0) & (iy[:, None] < sy1)
                         & (ixr[None, :] >= sx0) & (ixr[None, :] < sx1))
        if self.do_canny_pruning:
            # skip-by-2 + no-eval when the window's edge density is low
            # (tempcv.cpp:1396-1405: s < 100 or sq < 20; pq aliases the
            # plain sum integral)
            cs = self._rect_sum_map(planes["canny"], xs["canny_y"],
                                    xs["canny_x"], shape)
            cq = self._rect_sum_map(planes["sum"], xs["canny_y"],
                                    xs["canny_x"], shape)
            canny_ok_map = (cs >= 100) & (cq >= 20)
            canny_ok = canny_ok_map[yc[:, None], xc[None, :]]
        else:
            canny_ok = jnp.ones((self.max_y, self.max_x), bool)
        lat_front = front_possible[yc[:, None], xc[None, :]] & inb & canny_ok
        lat_vnf = vnf[yc[:, None], xc[None, :]]

        # ---- compact front survivors (static cap) ------------------------
        from .pyramid import _compact
        n_lat = self.max_y * self.max_x
        flat = lat_front.reshape(-1)
        surv_idx, n_surv = _compact(flat, cap)
        valid = surv_idx < n_lat
        surv_idx_c = jnp.where(valid, surv_idx, 0)
        siy = surv_idx_c // self.max_x
        six = surv_idx_c % self.max_x
        sy = yc[siy]
        sx = xc[six]
        svnf = lat_vnf.reshape(-1)[surv_idx_c]

        # ---- tail stages on survivors (staged chunked gathers) ------------
        accept, trunc = self._tail_accept(planes, xs, sy, sx, svnf,
                                          valid=valid)
        accept = accept & valid
        # a truncated staged compaction means dropped windows: report an
        # over-cap survivor count so the host regrows self.cap and
        # re-runs (all group caps scale with it)
        n_surv = jnp.maximum(n_surv,
                             jnp.where(trunc, jnp.int32(cap + 1), 0))

        # ---- visit-set (skip-by-2) + final accept -------------------------
        # f = (result == 0): stage-0 reject for stump/CART cascades (return
        # value -i with i == 0, tempcv.cpp:1163); ANY reject for stage-tree
        # cascades (return 0, tempcv.cpp:858).
        acc_lat = jnp.zeros((n_lat,), bool).at[surv_idx].set(
            accept, mode="drop").reshape(self.max_y, self.max_x)
        if self.is_tree:
            f_lat = inb & ~(canny_ok & acc_lat)
        else:
            f_lat = inb & (~canny_ok
                           | fail0[yc[:, None], xc[None, :]])

        # The skip automaton skip[i+1] = f[i] & ~skip[i] (with skip[0]=0)
        # has the closed form: skip[i] = 1 iff the run of consecutive f=1
        # ending at i-1 has odd length (a skipped position resets the
        # alternation).  Run length = i - index_of_last_zero, and the last
        # zero is a running max — a cheap cumulative op instead of a
        # sequential loop over scan columns.
        col = jax.lax.broadcasted_iota(jnp.int32, f_lat.shape, 1)
        last0 = jax.lax.cummax(jnp.where(f_lat, jnp.int32(-1), col), axis=1)
        runlen = col - last0
        odd_run = f_lat & ((runlen & 1) == 1)
        skip = jnp.concatenate(
            [jnp.zeros((self.max_y, 1), bool), odd_run[:, :-1]], axis=1)
        visited = ~skip

        ok = accept & visited.reshape(-1)[surv_idx_c] & valid
        return dict(sy=sy, sx=sx, ok=ok, n_surv=n_surv)

    def _votes_range(self, planes, xs, sy, sx, svnf, c0, c1):
        """Chunked corner gathers + CART votes for classifiers [c0, c1)
        over the given survivor coordinate arrays.  Chunks are unrolled
        in Python: gathers inside lax.scan bodies scalarize on TPU (see
        pyramid._tail_accept)."""
        c = self.compiled
        dtype = self.dtype
        n_rng = c1 - c0
        T = self.tables.T
        ck = min(self.clf_chunk, max(n_rng, 1))
        n_chunks = -(-n_rng // ck)
        padded = n_chunks * ck
        consts = self._consts

        def pad_clf(a, fill=0):
            a = a[c0:c1]
            padn = padded - a.shape[0]
            if padn == 0:
                return a
            return jnp.concatenate(
                [a, jnp.full((padn,) + a.shape[1:], fill, a.dtype)], 0)

        chunk_in = dict(
            cy=pad_clf(xs["corner_y"]).reshape(n_chunks, ck, T, 3, 4),
            cx=pad_clf(xs["corner_x"]).reshape(n_chunks, ck, T, 3, 4),
            w=pad_clf(xs["weight"]).reshape(n_chunks, ck, T, 3),
            thr=pad_clf(consts["threshold"]).reshape(n_chunks, ck, T),
            left=pad_clf(consts["left"]).reshape(n_chunks, ck, T),
            right=pad_clf(consts["right"]).reshape(n_chunks, ck, T),
            alpha=pad_clf(consts["alpha"]).reshape(n_chunks, ck, T + 1),
        )
        tilt = np.zeros((padded, T), bool)
        tilt[:n_rng] = self.tables.use_tilted[c0:c1]
        chunk_in["tilt"] = jnp.asarray(tilt).reshape(n_chunks, ck, T)

        def chunk_votes(cxs):
            # 2-D gathers on purpose: a [cap, ck, T, 3, 4] gather result
            # forces a (4,128)-tiled layout on the tiny (3,4) minor dims
            # — a measured 42.7x HBM padding blowup (two 8G temps) that
            # OOMs the 1080p scale-cascade program at grown caps.  The
            # flattened form gathers the same elements in the same order
            # and every float op keeps the oracle's accumulation order,
            # so results are bit-identical.
            flat = ck * T * 12
            gy = sy[:, None] + cxs["cy"].reshape(1, flat)
            gx = sx[:, None] + cxs["cx"].reshape(1, flat)
            v = planes["sum"][gy, gx]
            if c.has_tilted:
                v_t = planes["tilted"][gy, gx]
                tmask = jnp.repeat(cxs["tilt"].reshape(-1), 12)[None]
                v = jnp.where(tmask, v_t, v)
            # corners are the fastest-varying flat index: stride-4 slices
            # pick the (+,-,-,+) corners of every (clf, node, rect).
            # Difference in INT before the dtype cast: raw 1080p integral
            # values reach ~5e8 (> 2^24), so casting corners to f32 first
            # loses low bits the oracle (double from int, tempcv.cpp:782)
            # never loses; the int32 combination is exact (|v0-v1-v2+v3|
            # < 2^31) and window-bounded afterwards.  Matches the dense
            # front maps' cast order (_rect_sum_map -> _node_value_map).
            rs = (v[:, 0::4] - v[:, 1::4] - v[:, 2::4]
                  + v[:, 3::4]).astype(dtype)
            w = cxs["w"].reshape(1, -1).astype(dtype)  # [1, ck*T*3]
            prod = rs * w
            # rect-ordered sum, matching the oracle's accumulation order
            nv = (prod[:, 0::3] + prod[:, 1::3]
                  + prod[:, 2::3]).reshape(-1, ck, T)
            from .pyramid import _cart_votes
            return _cart_votes(
                nv, svnf,
                dict(threshold=cxs["thr"], left=cxs["left"],
                     right=cxs["right"], alpha=cxs["alpha"]),
                T, dtype)

        return jnp.concatenate(
            [chunk_votes(jax.tree_util.tree_map(lambda a: a[i], chunk_in))
             for i in range(n_chunks)], axis=1)[:, :n_rng]

    def _stage_groups(self, node_budget: int = 256):
        """Partition tail stages [front_k, n_stages) into contiguous
        groups of ~node_budget classifiers (one all-stages group under
        the non-staged "block"/"direct" strategies)."""
        spec = self.compiled.spec
        if self.strategy in ("block", "direct"):
            node_budget = 1 << 30
        groups = []
        s = self.front_k
        while s < self.n_stages:
            e, nodes = s, 0
            while e < self.n_stages and (
                    nodes == 0
                    or nodes + int(spec.stage_clf_cnt[e]) <= node_budget):
                nodes += int(spec.stage_clf_cnt[e])
                e += 1
            groups.append((s, e))
            s = e
        return groups

    def _tail_accept(self, planes, xs, sy, sx, svnf, valid=None):
        """Tail-stage evaluation on the compacted survivors.

        Sequential cascades run STAGED: stage groups are evaluated over
        progressively COMPACTED survivor sets with a static shrinking
        cap schedule — the TPU analog of the reference's per-stage
        worklist compaction (runSubwindow ping-pong, clod.cpp:1448-1471
        / clod.cpp:1270-1302), with cumsum+scatter compaction replacing
        the atomic append.  This matters because the corner gathers are
        element-rate bound (~0.27 G elem/s): evaluating all ~2k
        classifiers on every front survivor cost ~4 s/scale at VGA
        full depth; the staged schedule touches late stages only with
        the few windows still alive (~25x less gather volume).

        Stage trees (alt_tree) keep the all-stages evaluation — the
        path masks need every stage's pass bit (tempcv.cpp:834-861).

        Returns (accept [cap] bool, truncated scalar bool); ``truncated``
        means a group's survivors overflowed the shrunk cap and the
        caller must regrow ``self.cap`` and re-run.
        """
        c = self.compiled
        spec = c.spec
        dtype = self.dtype
        cap = self.cap
        thr = self._consts["stage_threshold"]
        no_trunc = jnp.zeros((), bool)
        if self.is_tree:
            votes = self._votes_range(planes, xs, sy, sx, svnf, 0,
                                      self.tables.n_clf)
            seg = jnp.stack(
                [jnp.sum(votes[:, int(spec.stage_clf_ofs[s]):
                               int(spec.stage_clf_ofs[s])
                               + int(spec.stage_clf_cnt[s])], axis=1)
                 for s in range(self.n_stages)], axis=0)
            st_pass = (seg >= thr[:, None].astype(dtype)).T
            pm = self._path_mask
            per_path = jnp.all(st_pass[:, None, :] | ~pm[None], axis=-1)
            return jnp.any(per_path, axis=-1), no_trunc
        groups = self._stage_groups()
        if not groups:
            return jnp.ones((cap,), bool), no_trunc
        from .pyramid import _compact
        cur_sy, cur_sx, cur_svnf = sy, sx, svnf
        orig = jnp.arange(cap, dtype=jnp.int32)
        # start from the caller's validity so padding slots never eat
        # compaction capacity in later groups
        alive = (jnp.ones((cap,), bool) if valid is None else valid)
        cur_n = cap
        trunc = no_trunc
        for gi, (s0, s1) in enumerate(groups):
            c0 = int(spec.stage_clf_ofs[s0])
            c1 = int(spec.stage_clf_ofs[s1 - 1]
                     + spec.stage_clf_cnt[s1 - 1])
            votes = self._votes_range(planes, xs, cur_sy, cur_sx,
                                      cur_svnf, c0, c1)
            ok = alive
            for st in range(s0, s1):
                o0 = int(spec.stage_clf_ofs[st]) - c0
                o1 = o0 + int(spec.stage_clf_cnt[st])
                ssum = jnp.sum(votes[:, o0:o1], axis=1)
                ok = ok & (ssum >= thr[st].astype(dtype))
            if gi == len(groups) - 1:
                accept = jnp.zeros((cap + 1,), bool).at[
                    jnp.where(ok, orig, cap)].set(
                        True, mode="drop")[:cap]
                return accept, trunc
            ncap = min(max(cap >> (gi + 1), cap // 8, 512), cur_n)
            aidx, n_pass = _compact(ok, ncap)
            trunc = trunc | (n_pass > ncap)
            valid = aidx < cur_n
            sel = jnp.where(valid, aidx, 0)
            cur_sy = jnp.where(valid, cur_sy[sel], 0)
            cur_sx = jnp.where(valid, cur_sx[sel], 0)
            cur_svnf = jnp.where(valid, cur_svnf[sel],
                                 jnp.ones((), dtype))
            orig = jnp.where(valid, orig[sel], cap)
            alive = valid
            cur_n = ncap

    def _prep_device(self, gray):
        c = self.compiled
        ii = integral_images(gray, with_tilted=c.has_tilted)
        padw = [(0, self._pad), (0, self._pad)]
        planes = {
            "sum": jnp.pad(ii.sum, padw),
            "sq_hi": jnp.pad(ii.sq_hi, padw),
            "sq_lo": jnp.pad(ii.sq_lo, padw),
        }
        if c.has_tilted:
            planes["tilted"] = jnp.pad(ii.tilted, padw)
        if self.do_canny_pruning:
            from ..ops.canny import canny
            from ..ops.integral import _integral_2d
            edges = canny(gray, 0, 50)
            planes["canny"] = jnp.pad(_integral_2d(edges.astype(jnp.int32)),
                                      padw)
        return planes

    def _detect_device(self, gray):
        planes = self._prep_device(gray)

        def body(carry, xs):
            return carry, self._per_scale(planes, xs)

        _, out = jax.lax.scan(body, None, self._scan_xs)
        return out

    def _xs_scale(self, i, dev=None):
        """Scale ``i``'s table slice as device arrays — passed as jit
        *arguments* (safe; only closure-captured committed jax.Arrays
        poison the dispatch path, docs/PERF.md) so all scales share one
        compiled program.  ``dev`` commits the tables to a specific
        device (scale-split execution); a jit's operands must share a
        device, so callers whose other operands live on the default
        device (e.g. find_biggest_object) must leave it None."""
        cache = getattr(self, "_xs_dev", None)
        if cache is None:
            cache = self._xs_dev = {}
        xs = cache.get((i, dev))
        if xs is None:
            xs = jax.tree_util.tree_map(lambda a: jnp.asarray(a[i]),
                                        self._scan_xs)
            if dev is not None:
                xs = jax.device_put(xs, dev)
            cache[(i, dev)] = xs
        return xs

    def _detect_unrolled(self, gray):
        """Scale loop as per-scale jitted dispatches (the TPU path).

        The lax.scan formulation crashes the TPU runtime worker at >=VGA
        sizes (reproduced 2026-08-17: 'TPU worker process crashed or
        restarted' on the scan-with-in-loop-gathers program; the same
        per-scale computation dispatched as standalone programs runs
        fine).  Every scale shares ONE compiled program: the per-scale
        tables (corner offsets, scan lattice, window sizes) enter as
        *runtime arguments* — same shapes at every scale, so the ~25
        per-scale dispatches hit a single jit cache entry instead of
        compiling ~25 specialized programs (which cost ~30 min of axon
        remote compiles at VGA full depth).  Dispatches are async and
        overlap.  A final packer jit compacts each scale's accepted
        windows and ships ONE array to the host (each readback pays
        ~24 ms of tunnel sync).  Returns the same dict as the scan
        path, minus the full per-window arrays when the compact view
        suffices.
        """
        if self._jit_prep is None:
            self._jit_prep = jax.jit(self._prep_device)
        key = self.cap
        jits = self._jit_scales.get(key)
        if jits is None:
            shared = jax.jit(
                lambda planes, xs: self._per_scale(planes, xs))

            def mk(i):
                devs_ = self._scale_devices
                xs_i = self._xs_scale(
                    i, devs_[i % len(devs_)] if devs_ else None)
                return lambda planes: shared(planes, xs_i)

            acap = min(self.cap, 2048)

            def pack(outs):
                from .pyramid import _compact

                def one(o):
                    aidx, n_acc = _compact(o["ok"], acap)
                    sel = jnp.where(aidx < o["ok"].shape[0], aidx, 0)
                    return jnp.concatenate([
                        o["n_surv"].astype(jnp.int32).reshape(1),
                        n_acc.astype(jnp.int32).reshape(1),
                        o["sy"][sel].astype(jnp.int32),
                        o["sx"][sel].astype(jnp.int32)])

                return jnp.stack([one(o) for o in outs])

            jits = ([mk(i) for i in range(self.n_scales)], jax.jit(pack),
                    acap)
            self._jit_scales[key] = jits
        scale_jits, packer, acap = jits
        planes = self._jit_prep(jnp.asarray(gray, jnp.uint8))
        devs = self._scale_devices
        if devs:
            # scale-split execution: broadcast the integral planes once,
            # then commit scale i's dispatch to devices[i % k] — the
            # shared program runs concurrently across the mesh
            planes_d = [jax.device_put(planes, d) for d in devs]
        outs = []
        for i, j in enumerate(scale_jits):
            outs.append(j(planes_d[i % len(devs)] if devs else planes))
            if i % 8 == 7:
                # throttle in-flight executions: each holds its gather
                # temps in HBM until it retires, and block_until_ready
                # does not reliably sync on this platform — a tiny
                # readback is the only real barrier
                np.asarray(outs[i]["n_surv"])
        if devs:
            # pack per device (a jit's operands must share a device),
            # merge on host in scale order
            packed = np.empty((self.n_scales, 2 + 2 * acap), np.int32)
            per_dev = {}
            for i in range(self.n_scales):
                per_dev.setdefault(i % len(devs), []).append(i)
            for scale_ids in per_dev.values():
                packed[scale_ids] = np.asarray(
                    packer([outs[i] for i in scale_ids]))
        else:
            packed = np.asarray(packer(outs))
        out = {"n_surv": packed[:, 0], "n_acc": packed[:, 1],
               "acc_y": packed[:, 2:2 + acap],
               "acc_x": packed[:, 2 + acap:2 + 2 * acap]}
        if np.any(out["n_acc"] > acap):
            # accept-compaction overflow: fall back to the full arrays
            out = jax.tree_util.tree_map(
                lambda *a: np.stack([np.asarray(x) for x in a]), *outs)
        return out

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------

    def candidates(self, gray) -> Tuple[np.ndarray, bool]:
        """Raw (pre-grouping) candidate boxes, in the oracle's scan order.
        Returns (boxes [m,4] int32, overflow flag).

        If a scale's front-stage survivors overflow the static cap, the
        program is re-specialized with a 4x cap and re-run (the static-shape
        answer to the reference's unbounded atomic-append worklists,
        clod.cl:85-91); the flag stays True only if the hard lattice-size
        ceiling is hit."""
        if self.n_scales == 0:
            return np.zeros((0, 4), np.int32), False
        import contextlib
        ctx = (jax.default_device(self._exec_device) if self._exec_device
               else contextlib.nullcontext())
        with ctx:
            if self._use_unrolled:
                def run(g):
                    return self._detect_unrolled(g)
            else:
                def run(g):
                    return jax.tree_util.tree_map(
                        np.asarray,
                        self._jit_detect(jnp.asarray(g, jnp.uint8)))
            out = run(gray)
            lattice = self.max_y * self.max_x
            while bool(np.any(out["n_surv"] > self.cap)) \
                    and self.cap < lattice:
                self.cap = min(self.cap * 4, lattice)
                self._jit_detect = jax.jit(self._detect_device)
                out = run(gray)
        boxes: List[np.ndarray] = []
        overflow = bool(np.any(out["n_surv"] > self.cap))
        for k in range(self.n_scales):
            if "acc_y" in out:
                na = int(out["n_acc"][k])
                if na == 0:
                    continue
                sy = out["acc_y"][k][:na]
                sx = out["acc_x"][k][:na]
            else:
                ok = out["ok"][k]
                if not ok.any():
                    continue
                sx = out["sx"][k][ok]
                sy = out["sy"][k][ok]
            ww = np.full_like(sx, self.win_w[k])
            wh = np.full_like(sx, self.win_h[k])
            boxes.append(np.stack([sx, sy, ww, wh], axis=1))
        if boxes:
            cand = np.concatenate(boxes, axis=0).astype(np.int32)
        else:
            cand = np.zeros((0, 4), np.int32)
        return cand, overflow

    def find_biggest_object(self, gray, min_neighbors: int = 3,
                            min_size: Tuple[int, int] = (0, 0),
                            rough_search: bool = False) -> np.ndarray:
        """CV_HAAR_FIND_BIGGEST_OBJECT driver with device-side window
        evaluation (tempcv.cpp:1349-1454, 1477-1489).

        The ROI-shrink loop is inherently sequential host logic (the
        reference runs it on the host too and only parallelizes the
        per-scale window sweep); each scale's evaluation runs the
        compiled per-scale program with a dynamic scan-ROI argument.
        Scales descend from the largest; after the first scale that
        yields candidates, the scan narrows to an eps-expanded ROI
        around the biggest grouped box and the minimum window rises to
        0.4 (0.6 with DO_ROUGH_SEARCH) of it.  Build the detector with
        ``min_size=(0, 0)`` so every factor is available; pass the
        caller's minSize here.  Returns the single biggest box [1, 4]
        (or empty [0, 4]).
        """
        eps = 0.2
        if self.n_scales == 0:
            return np.zeros((0, 4), np.int32)
        if self._jit_prep is None:
            self._jit_prep = jax.jit(self._prep_device)
        if not hasattr(self, "_fbo_acap"):
            self._fbo_acap = min(self.cap, 2048)

        def get_jits():
            key = ("fbo", self.cap, self._fbo_acap)
            jits = self._jit_scales.get(key)
            if jits is None:
                acap = self._fbo_acap

                # one shared program for every scale (tables are runtime
                # args, same shapes at all scales — see _xs_scale)
                @jax.jit
                def shared(planes, xs, roi):
                    from .pyramid import _compact
                    o = self._per_scale(planes, xs,
                                        roi=(roi[0], roi[1], roi[2],
                                             roi[3]))
                    aidx, n_acc = _compact(o["ok"], acap)
                    sel = jnp.where(aidx < o["ok"].shape[0], aidx, 0)
                    return jnp.concatenate([
                        o["n_surv"].astype(jnp.int32).reshape(1),
                        n_acc.astype(jnp.int32).reshape(1),
                        o["sy"][sel].astype(jnp.int32),
                        o["sx"][sel].astype(jnp.int32)])

                def mk(i):
                    xs_i = self._xs_scale(i)
                    return lambda planes, roi: shared(planes, xs_i, roi)

                jits = ([mk(i) for i in range(self.n_scales)], acap)
                self._jit_scales[key] = jits
            return jits

        planes = self._jit_prep(jnp.asarray(gray, jnp.uint8))
        H, W = self.H, self.W
        min_w, min_h = min_size
        scan_roi = None
        candidates: List[Tuple[int, int, int, int]] = []
        lattice = self.max_y * self.max_x

        def run_scale(k, roi_np):
            # overflow handling mirrors candidates(): grow the survivor
            # cap (and the accept compaction cap) and re-specialize
            # rather than silently clamping — a dense frame could
            # otherwise drop candidates and change the biggest object
            while True:
                scale_jits, acap = get_jits()
                p = np.asarray(scale_jits[k](planes,
                                             jnp.asarray(roi_np,
                                                         jnp.int32)))
                grew = False
                if int(p[0]) > self.cap and self.cap < lattice:
                    self.cap = min(self.cap * 4, lattice)
                    grew = True
                if int(p[1]) > acap and acap < self.cap:
                    self._fbo_acap = min(self.cap, acap * 4)
                    grew = True
                if not grew:
                    break
            na = min(int(p[1]), acap)
            return np.stack([p[2 + acap:2 + acap + na], p[2:2 + na],
                             np.full(na, self.win_w[k], np.int32),
                             np.full(na, self.win_h[k], np.int32)],
                            axis=1) if na else np.zeros((0, 4), np.int32)

        for k in reversed(range(self.n_scales)):
            factor = float(self.scales[k])
            ystep = max(2.0, factor)
            win_w, win_h = int(self.win_w[k]), int(self.win_h[k])
            if win_w < min_w or win_h < min_h:
                break  # descending scales: nothing smaller qualifies
            if scan_roi is None:
                roi = (0, int(cv_round((H - win_h) / ystep)),
                       0, int(cv_round((W - win_w) / ystep)))
            else:
                rx, ry, rw, rh = scan_roi
                roi = (int(cv_round(ry / ystep)),
                       int(cv_round((ry + rh - win_h) / ystep)),
                       int(cv_round(rx / ystep)),
                       int(cv_round((rx + rw - win_w) / ystep)))
            boxes_k = run_scale(k, roi)
            candidates.extend(map(tuple, boxes_k.tolist()))
            if candidates and scan_roi is None:
                # lock on: group, expand the biggest box by eps, raise
                # the minimum window (tempcv.cpp:1422-1454)
                grouped, _ = group_rectangles(
                    np.asarray(candidates, np.int64),
                    max(min_neighbors, 1), eps)
                if len(grouped):
                    areas = grouped[:, 2] * grouped[:, 3]
                    mx = grouped[int(np.argmax(areas))]
                    candidates.append(tuple(int(v) for v in mx))
                    dx = int(cv_round(mx[2] * eps))
                    dy = int(cv_round(mx[3] * eps))
                    rx = max(int(mx[0]) - dx, 0)
                    ry = max(int(mx[1]) - dy, 0)
                    rw = min(int(mx[2]) + dx * 2, W - 1 - rx)
                    rh = min(int(mx[3]) + dy * 2, H - 1 - ry)
                    scan_roi = (rx, ry, rw, rh)
                    min_scale = 0.6 if rough_search else 0.4
                    min_w = int(cv_round(mx[2] * min_scale))
                    min_h = int(cv_round(mx[3] * min_scale))
        boxes = np.asarray(candidates, np.int64).reshape(-1, 4)
        boxes, neigh = group_rectangles(boxes, max(min_neighbors, 1), eps)
        if not len(boxes):
            return np.zeros((0, 4), np.int32)
        biggest = boxes[int(np.argmax(boxes[:, 2] * boxes[:, 3]))]
        return biggest[None].astype(np.int32)

    def detect(self, gray, min_neighbors: int = 3) -> DetectionResult:
        """Full detection incl. grouping (cvHaarDetectObjectsForROC tail,
        tempcv.cpp:1461-1472)."""
        cand, overflow = self.candidates(gray)
        if min_neighbors != 0:
            boxes, neigh = group_rectangles(cand, max(min_neighbors, 1),
                                            eps=0.2)
        else:
            boxes, neigh = cand, np.ones(len(cand), np.int32)
        return DetectionResult(boxes=boxes, neighbors=neigh,
                               candidates=cand, survivor_overflow=overflow)
