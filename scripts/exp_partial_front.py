#!/usr/bin/env python
"""Feasibility probe: conservative partial-node front gates.

The dense front pays every node of every front stage at every canvas
position (VPU wall: ~0.066 ms/node at 1080p).  Because the survivor
tail can re-verify any stage exactly, the front only needs to be
CONSERVATIVE — never reject a true survivor.  A stage gate evaluated on
a node-prefix E with upper bound

    S_ub = sum_{i in E} v_i + sum_{i not in E} max(alpha_l_i, alpha_r_i)

rejects soundly whenever S_ub < T_s.  This script measures, per stage,
how much of the exact gate's rejection power survives at each prefix
fraction — i.e. whether the front could drop ~half its nodes for a
small survivor inflation.  CPU/NumPy only (uses the detector's dense
f32 maps at VGA).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from clfacedetection_tpu.detect.pyramid import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    n_front = int(os.environ.get("CLFD_EXP_STAGES", "8"))
    det = PyramidDetector(spec, img.shape, min_size=(40, 40),
                          front_stages=n_front, use_pallas_front=False)
    t = det.tables
    c = det.compiled

    # per-classifier dense vote maps, stage by stage
    planes, sq_hi, sq_lo = jax.jit(det._prep_planes)(
        jnp.asarray(img, jnp.uint8))
    shape = (det.plan.canvas_h + 1, det.plan.canvas_w + 1)
    f = jax.jit(lambda p, h, l: det._front_from_planes(p, h, l))
    # reuse internals: build vnf once
    win_sum = det._rect_sum_map(planes["sum"], det.equ_y, det.equ_x, shape)
    hi = det._rect_sum_map(sq_hi, det.equ_y, det.equ_x, shape)
    lo = det._rect_sum_map(sq_lo, det.equ_y, det.equ_x, shape)
    win_sq = hi.astype(jnp.float32) * 256.0 + lo.astype(jnp.float32)
    inv = np.float32(det.inv_area)
    mean = win_sum.astype(jnp.float32) * inv
    var = win_sq * inv - mean * mean
    vnf = jnp.where(var >= 0, jnp.sqrt(jnp.maximum(var, 0)), 1.0)

    visit = det._visit
    alive = np.asarray(visit).copy()
    total0 = alive.sum()
    print(f"visit positions: {total0}")

    dense_nodes = 0
    part_nodes_half = 0
    for st in range(n_front):
        c0 = int(c.spec.stage_clf_ofs[st])
        cnt = int(c.spec.stage_clf_cnt[st])
        thr = float(c.stage_threshold[st])
        votes = []
        amax = []
        for j in range(cnt):
            clf = c0 + j
            nv = None
            for k in range(3):
                wk = float(t.weight[0][clf, 0, k])
                if wk == 0.0:
                    continue
                rs = det._rect_sum_map(
                    planes["sum"], t.corner_y[0][clf, 0, k],
                    t.corner_x[0][clf, 0, k], shape).astype(jnp.float32)
                nv = rs * np.float32(wk) if nv is None else nv + rs * \
                    np.float32(wk)
            a_l = float(t.alpha[clf, -t.left[clf, 0]])
            a_r = float(t.alpha[clf, -t.right[clf, 0]])
            v = jnp.where(nv < np.float32(t.threshold[clf, 0]) * vnf,
                          np.float32(a_l), np.float32(a_r))
            votes.append(np.asarray(v))
            amax.append(max(a_l, a_r))
        votes = np.stack(votes)           # [cnt, H, W]
        amax = np.array(amax)
        exact = votes.sum(0)
        exact_alive = alive & (exact >= thr)
        n_exact = exact_alive.sum()
        line = [f"s{st:2d} n={cnt:3d} alive {alive.sum():8d} -> "
                f"exact {n_exact:8d}"]
        for frac in (0.25, 0.5, 0.75):
            k = max(1, int(round(cnt * frac)))
            ub = votes[:k].sum(0) + amax[k:].sum()
            ub_alive = alive & (ub >= thr)
            infl = ub_alive.sum() / max(n_exact, 1)
            line.append(f"ub@{frac:.2f}: {ub_alive.sum():8d} "
                        f"(x{infl:.2f})")
        print("  ".join(line), flush=True)
        dense_nodes += cnt
        part_nodes_half += max(1, int(round(cnt * 0.5)))
        alive = exact_alive
    print(f"dense front nodes {dense_nodes}, half-prefix {part_nodes_half}")


if __name__ == "__main__":
    main()
