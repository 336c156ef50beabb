#!/usr/bin/env python
"""Round-4 experiment: EXACT position-block bounding (VERDICT r3 Next #1a).

Idea under test: evaluate front stages at 1/4 position density using
interval bounds on each stage sum over a 2x2 position block.  Pixel
values are non-negative, so a rect sum at any of the 4 block positions is
bounded by the eroded rect (intersection of the 4 shifted rects) from
below and the dilated rect (their union) from above -- both one
integral-image lookup.  Propagating those intervals through the stump
votes (undetermined votes contribute [min(alpha), max(alpha)]) gives an
exact upper bound on each block's best-case stage sum: blocks whose
best case still fails the stage threshold are provably dead with ZERO
parity risk (unlike the partial-node gates of negative result #2).

The question this script answers on the bench scene: how many blocks can
interval bounds actually kill, at what depth, and does the implied
schedule (bound-front at 1/4 density + exact re-evaluation of live-block
positions) beat the measured 44 ms dense saddle?

Outputs per stage depth: exact position survivors, bound-live blocks,
positions inside live blocks, and the bound's inflation factor over the
exact survivor count.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from clfacedetection_tpu.detect.pyramid import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.ops.resize import resize_bilinear_u8_np
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    shape = (1080, 1920)
    gray = photo_scene(shape)
    det = PyramidDetector(spec, shape, min_size=(40, 40), front_stages=12,
                          cap=16384, use_pallas_front=False)
    plan = det.plan

    # canvas (numpy twin of _assemble_canvas)
    canvas = np.zeros((plan.canvas_h, plan.canvas_w), np.uint8)
    for lv in plan.levels:
        lvl = gray if (lv.h, lv.w) == shape else \
            resize_bilinear_u8_np(gray, (lv.h, lv.w))
        canvas[lv.oy:lv.oy + lv.h, lv.ox:lv.ox + lv.w] = lvl

    # integral planes padded past the canvas by a window extent +2 and
    # edge-replicated: out-of-canvas pixels contribute 0 to any rect sum
    # (exact), and every lookup for a visited position stays in-bounds
    pad = spec.window_w + spec.window_h + 4
    c64 = canvas.astype(np.int64)
    ii = np.zeros((canvas.shape[0] + 1 + pad, canvas.shape[1] + 1 + pad),
                  np.int64)
    ii[1:canvas.shape[0] + 1, 1:canvas.shape[1] + 1] = \
        c64.cumsum(0).cumsum(1)
    ii[canvas.shape[0] + 1:, :] = ii[canvas.shape[0], :]
    ii[:, canvas.shape[1] + 1:] = ii[:, canvas.shape[1]][:, None]
    qq = np.zeros_like(ii, np.float64)
    qq[1:canvas.shape[0] + 1, 1:canvas.shape[1] + 1] = \
        (c64 * c64).astype(np.float64).cumsum(0).cumsum(1)
    qq[canvas.shape[0] + 1:, :] = qq[canvas.shape[0], :]
    qq[:, canvas.shape[1] + 1:] = qq[:, canvas.shape[1]][:, None]

    hv, wv = plan.canvas_h + 1, plan.canvas_w + 1
    visit = det._visit_np[:hv, :wv]

    t = det.tables
    cy = np.asarray(t.corner_y[0])   # [n_clf, T, 3, 4]
    cx = np.asarray(t.corner_x[0])
    wgt = np.asarray(t.weight[0])    # [n_clf, T, 3]
    thr = np.asarray(t.threshold)    # [n_clf, T]
    alpha = np.asarray(t.alpha)      # [n_clf, T+1]
    left = np.asarray(t.left)
    right = np.asarray(t.right)
    cspec = det.compiled.spec
    stage_thr = np.asarray(det._consts["stage_threshold"], np.float64)

    # ---- helper: rect sum map over a position grid ---------------------
    def rsum(img, y0, x0, h, w, ys, xs):
        """img integral (ii[y] == I[y], zero row 0); rect rooted at
        (y0+Y, x0+X) for Y in ys, X in xs (index arrays)."""
        a = img[y0:, x0:]
        return (a[np.ix_(ys + h, xs + w)] - a[np.ix_(ys, xs + w)]
                - a[np.ix_(ys + h, xs)] + a[np.ix_(ys, xs)])

    def node_geom(c, tt):
        """list of (ry, rx, rh, rw, weight) from the corner tables
        (upright only: frontalface_alt has no tilted nodes)."""
        out = []
        for k in range(3):
            w_ = float(wgt[c, tt, k])
            if w_ == 0.0:
                continue
            ry, rx = int(cy[c, tt, k, 0]), int(cx[c, tt, k, 0])
            rh = int(cy[c, tt, k, 2]) - ry
            rw = int(cx[c, tt, k, 1]) - rx
            out.append((ry, rx, rh, rw, w_))
        return out

    equ_y, equ_x = det.equ_y, det.equ_x
    e_ry, e_rx = int(equ_y[0]), int(equ_x[0])
    e_rh = int(equ_y[2]) - e_ry
    e_rw = int(equ_x[1]) - e_rx
    inv_area = float(det.inv_area)

    # ---------------- exact dense pass (reference survival) -------------
    ys = np.arange(hv)
    xs = np.arange(wv)
    win_sum = rsum(ii, e_ry, e_rx, e_rh, e_rw, ys, xs).astype(np.float64)
    win_sq = rsum(qq, e_ry, e_rx, e_rh, e_rw, ys, xs)
    mean = win_sum * inv_area
    var = win_sq * inv_area - mean * mean
    vnf = np.where(var >= 0, np.sqrt(np.maximum(var, 0)), 1.0)

    t0 = time.time()
    alive = visit.copy()
    exact_surv = []
    for st in range(det.front_k):
        ssum = np.zeros((hv, wv), np.float64)
        c0, cnt = int(cspec.stage_clf_ofs[st]), int(cspec.stage_clf_cnt[st])
        for c in range(c0, c0 + cnt):
            v = np.zeros((hv, wv), np.float64)
            for (ry, rx, rh, rw, w_) in node_geom(c, 0):
                v += w_ * rsum(ii, ry, rx, rh, rw, ys, xs)
            cond = v < thr[c, 0] * vnf
            a_l = alpha[c, -left[c, 0]]
            a_r = alpha[c, -right[c, 0]]
            ssum += np.where(cond, a_l, a_r)
        alive &= ssum >= stage_thr[st]
        exact_surv.append(int(alive.sum()))
    print(f"exact dense pass: {time.time()-t0:.1f}s, survivors/stage: "
          f"{exact_surv}", flush=True)

    # ---------------- interval-bound pass at 2x2 blocks ------------------
    bys = np.arange(0, hv, 2)
    bxs = np.arange(0, wv, 2)

    def rsum_lohi(img, ry, rx, rh, rw):
        """(lo, hi) of the rect sum over the 2x2 block: eroded and
        dilated rects (non-negative pixels)."""
        hi = rsum(img, ry, rx, rh + 1, rw + 1, bys, bxs)
        if rh >= 2 and rw >= 2:
            lo = rsum(img, ry + 1, rx + 1, rh - 1, rw - 1, bys, bxs)
        else:
            lo = np.zeros_like(hi)
        return lo, hi

    ws_lo, ws_hi = rsum_lohi(ii, e_ry, e_rx, e_rh, e_rw)
    sq_lo, sq_hi = rsum_lohi(qq, e_ry, e_rx, e_rh, e_rw)
    mean_lo = ws_lo * inv_area
    mean_hi = ws_hi * inv_area
    var_hi = sq_hi * inv_area - mean_lo * mean_lo
    var_lo = sq_lo * inv_area - mean_hi * mean_hi
    # vnf = sqrt(var) if var >= 0 else 1: interval must cover the 1 branch
    vnf_hi = np.where(var_hi >= 0, np.sqrt(np.maximum(var_hi, 0)), 1.0)
    vnf_hi = np.where(var_lo < 0, np.maximum(vnf_hi, 1.0), vnf_hi)
    vnf_lo = np.where(var_lo >= 0, np.sqrt(np.maximum(var_lo, 0)),
                      np.minimum(np.where(var_hi >= 0, np.sqrt(
                          np.maximum(var_hi, 0)), 1.0), 1.0))

    # block visit: any of the 4 positions visited
    vpad = np.zeros((len(bys) * 2, len(bxs) * 2), bool)
    vpad[:hv, :wv] = visit
    bvisit = (vpad.reshape(len(bys), 2, len(bxs), 2).any(axis=(1, 3)))

    t0 = time.time()
    balive = bvisit.copy()
    rows = []
    for st in range(det.front_k):
        s_lo = np.zeros((len(bys), len(bxs)), np.float64)
        s_hi = np.zeros_like(s_lo)
        c0, cnt = int(cspec.stage_clf_ofs[st]), int(cspec.stage_clf_cnt[st])
        n_det = 0
        for c in range(c0, c0 + cnt):
            v_lo = np.zeros_like(s_lo)
            v_hi = np.zeros_like(s_lo)
            for (ry, rx, rh, rw, w_) in node_geom(c, 0):
                lo, hi = rsum_lohi(ii, ry, rx, rh, rw)
                if w_ >= 0:
                    v_lo += w_ * lo
                    v_hi += w_ * hi
                else:
                    v_lo += w_ * hi
                    v_hi += w_ * lo
            tc = thr[c, 0]
            t_lo = tc * (vnf_lo if tc >= 0 else vnf_hi)
            t_hi = tc * (vnf_hi if tc >= 0 else vnf_lo)
            a_l = float(alpha[c, -left[c, 0]])
            a_r = float(alpha[c, -right[c, 0]])
            # v < t*vnf -> a_l else a_r
            always_l = v_hi < t_lo
            always_r = v_lo >= t_hi
            det_mask = always_l | always_r
            n_det += int((det_mask & balive).sum())
            vote_lo = np.where(always_l, a_l,
                               np.where(always_r, a_r, min(a_l, a_r)))
            vote_hi = np.where(always_l, a_l,
                               np.where(always_r, a_r, max(a_l, a_r)))
            s_lo += vote_lo
            s_hi += vote_hi
        balive &= s_hi >= stage_thr[st]
        nb = int(balive.sum())
        rows.append((st, exact_surv[st], nb, nb * 4,
                     n_det / max(cnt * max(nb, 1), 1)))
        print(f"stage {st:2d}: exact_surv {exact_surv[st]:8d} | live "
              f"blocks {nb:7d} (pos {nb*4:8d}, x{nb*4/max(exact_surv[st],1):6.2f}"
              f" vs exact) | det-vote frac {rows[-1][4]:.3f}", flush=True)
    print(f"bound pass: {time.time()-t0:.1f}s", flush=True)
    n_blocks = int(bvisit.sum())
    print(f"blocks visited: {n_blocks}; canvas positions: {int(visit.sum())}")


if __name__ == "__main__":
    main()
