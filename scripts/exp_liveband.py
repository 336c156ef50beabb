#!/usr/bin/env python
"""Feasibility probe: coarse rectangular repacking of the deep front.

docs/PERF.md's negative results rule out FINE-grained front gating
(per-vreg masks, sub-tile ``pl.when``, worklist cells: control tax >
savings) — but not COARSE repacking: after the first k front stages,
survivors cluster spatially, and a *crop* of the canvas keeps the
integral-image rows intact (rect sums are differences of entries that
move together), so live row-bands could be DMA-copied into a smaller
dense canvas and the remaining front stages run only there.

This script measures the ceiling of that idea on the bench scene: after
each front prefix k, the fraction of canvas area that survives at
  (a) live 8-row band granularity      (row-band repack),
  (b) live (8,128) tile granularity    (2-D tile repack),
  (c) exact survivor positions         (lower bound, unreachable),
each DILATED by the window footprint (a kept position needs rows
y..y+h0 and cols x..x+w0 of the integral planes for deeper stages).

CPU/NumPy only (XLA front, f32, 1080p photo scene).  If (a) at k=4
is <= ~0.5 the lever is worth building; if it is ~1.0 it joins the
negative results.
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
    shape = tuple(int(v) for v in os.environ.get(
        "CLFD_EXP_SHAPE", "1080x1920").split("x"))
    img = photo_scene(shape)
    gray = (np.round(0.114 * img[..., 0].astype(np.float64)
                     + 0.587 * img[..., 1] + 0.299 * img[..., 2])
            .astype(np.uint8) if img.ndim == 3 else img)
    kmax = int(os.environ.get("CLFD_EXP_STAGES", "12"))
    det = PyramidDetector(spec, gray.shape, min_size=(40, 40),
                          front_stages=kmax, use_pallas_front=False)
    h0, w0 = spec.window_h, spec.window_w

    planes, sq_hi, sq_lo = jax.jit(det._prep_planes)(
        jnp.asarray(gray, jnp.uint8))
    out_shape = (det.plan.canvas_h + 1, det.plan.canvas_w + 1)
    # stage maps, one pass per front stage (same code path the front
    # uses; ANDed progressively below)
    win_sum = det._rect_sum_map(planes["sum"], det.equ_y, det.equ_x,
                                out_shape).astype(jnp.float32)
    hi = det._rect_sum_map(sq_hi, det.equ_y, det.equ_x,
                           out_shape).astype(jnp.float32)
    lo = det._rect_sum_map(sq_lo, det.equ_y, det.equ_x,
                           out_shape).astype(jnp.float32)
    win_sq = hi * 256.0 + lo
    inv = np.float32(det.inv_area)
    mean = win_sum * inv
    var = win_sq * inv - mean * mean
    vnf = jnp.where(var >= 0, jnp.sqrt(jnp.maximum(var, 0)),
                    jnp.ones_like(var))
    passes = jax.jit(lambda p, v: det._front_maps(p, v, out_shape))(
        planes, vnf)
    passes = [np.asarray(p) for p in passes]

    visit = det._visit_np.astype(bool)
    H, W = visit.shape
    total = float(visit.size)
    mask = visit.copy()
    print(f"canvas {H}x{W} ({total/1e6:.2f} MPx), window {h0}x{w0}, "
          f"visit {visit.sum()/total:.3f}")
    print(f"{'k':>2} {'surv_frac':>9} {'dilated':>8} {'rowband8':>8} "
          f"{'tile8x128':>9} {'segrows(pad8)':>13}")
    for k, p in enumerate(passes[:kmax], start=1):
        mask &= p
        frac = mask.sum() / total
        # dilate by the window footprint: position (y,x) needs rows
        # y..y+h0 and cols x..x+w0
        dil = np.zeros_like(mask)
        ys, xs = np.nonzero(mask)
        if len(ys):
            # cheap dilation via cumulative trick: mark starts/ends
            m2 = np.zeros((H + h0 + 1, W + w0 + 1), np.int32)
            m2[ys, xs] += 1
            m2[ys + h0 + 1, xs] -= 1
            m2[ys, xs + w0 + 1] -= 1
            m2[ys + h0 + 1, xs + w0 + 1] += 1
            dil = (np.cumsum(np.cumsum(m2, 0), 1)[:H, :W] > 0)
        dfrac = dil.sum() / total
        rows_live = dil.any(1)
        band = rows_live.reshape(-1, 8).any(1) if H % 8 == 0 else \
            np.add.reduceat(rows_live, np.arange(0, H, 8)) > 0
        band_frac = band.mean()
        th, tw = -(-H // 8), -(-W // 128)
        pad = np.zeros((th * 8, tw * 128), bool)
        pad[:H, :W] = dil
        tiles = pad.reshape(th, 8, tw, 128).any((1, 3))
        tile_frac = tiles.mean()
        # contiguous live-row segments padded to 8 rows each (repack DMA
        # granularity): total repacked rows / H
        seg_rows = 0
        in_seg = False
        run = 0
        for r in rows_live:
            if r:
                run += 1
                in_seg = True
            elif in_seg:
                seg_rows += -(-run // 8) * 8
                run, in_seg = 0, False
        if in_seg:
            seg_rows += -(-run // 8) * 8
        print(f"{k:>2} {frac:>9.4f} {dfrac:>8.4f} {band_frac:>8.4f} "
              f"{tile_frac:>9.4f} {seg_rows / H:>13.4f}")


if __name__ == "__main__":
    main()
