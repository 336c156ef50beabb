"""Pallas TPU kernel: fused dense front-stage Haar evaluation.

This is the Pallas replacement for the pyramid detector's XLA front pass
(SURVEY.md section 7 build step 6): for every canvas position, compute the
variance-normalization factor and evaluate the first K cascade stages,
emitting the surviving-position mask and the vnf map.

Design (one kernel, one pass over the canvas):

* grid over (BH, BW) output tiles; each program DMAs the integral planes'
  (BH + h0 + 1, BW + w0 + 1) halo block HBM->VMEM (hand-rolled halo copy —
  BlockSpec blocks can't overlap), then evaluates every front node with
  *static* VMEM slices: at unit scale all rect corner offsets are
  compile-time constants, so a rect sum over the whole tile is pure
  shifted-slice arithmetic on the VPU.
* upright rects are evaluated through shared **row-difference maps**:
  for corners ((y1,x1),(y1,x2),(y2,x1),(y2,x2)) with signs (+,-,-,+),
  rect = D[x1] - D[x2] with D = I[y1,:] - I[y2,:].  D has no lane shift
  (column-aligned full-width subtract) and is cached per (plane, y1, y2)
  within each stage, so nodes sharing a row span pay for it once and the
  per-rect cost drops from 4 lane-rotated slices + 3 adds to 2 lane-rotated
  slices + 1 sub.  Integer reassociation is exact, so this is bit-identical
  to the 4-corner form.  Tilted rects (4 distinct corners,
  tempcv.cpp:743-750) keep the 4-corner form.
* stump votes / CART walks / stage sums / the static visit-lattice mask
  all happen in-register per tile; outputs are the boolean survivor tile
  and the float32 vnf tile.

The XLA fallback (PyramidDetector._front_maps) remains the specification;
the kernel must match it bit-for-bit in float32 (same float op order —
only the exact integer rect sums are reassociated).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_front_kernel"]


def build_front_kernel(tables, spec, stage_thresholds, front_k: int,
                       h0: int, w0: int, equ_y, equ_x, inv_area: float,
                       visit: np.ndarray, has_tilted: bool,
                       bh: int = 32, bw: int = 256,
                       batch: Optional[int] = None,
                       gate_after: int = 6):
    """Returns fn(planes: dict[str, i32[(B,) Hp, Wp]]) -> (front
    bool[(B,) Hv, Wv], vnf f32[(B,) Hv, Wv]) where (Hv, Wv) = visit.shape.

    ``tables`` is detect.detector._ClfTables built at scale 1.0; ``spec``
    the (possibly truncated) CascadeSpec; planes must be padded by at least
    one halo block so the DMAs stay in bounds.  ``batch`` bakes a leading
    frame dimension into the grid (vmap over a pallas_call with ANY-space
    operands is unsupported on TPU, so batching is explicit).
    """
    Hv, Wv = visit.shape
    grid_h = -(-Hv // bh)
    grid_w = -(-Wv // bw)
    # halo block sizes, rounded to the (8, 128) VMEM tiling Mosaic requires
    sh = -(-(bh + h0 + 2) // 8) * 8
    sw = -(-(bw + w0 + 2) // 128) * 128
    n_planes = 4 if has_tilted else 3      # sum, sq_hi, sq_lo[, tilted]
    visit_pad = np.zeros((grid_h * bh, grid_w * bw), bool)
    visit_pad[:Hv, :Wv] = visit

    clf_w = tables.weight[0]               # [n_clf, T, 3] scale-1 weights
    clf_cy = tables.corner_y[0]
    clf_cx = tables.corner_x[0]

    def kernel(sum_hbm, sqhi_hbm, sqlo_hbm, *rest):
        if has_tilted:
            tilt_hbm, visit_ref, front_ref, vnf_ref = rest[:4]
            scratches = rest[4:4 + n_planes]
            sems = rest[4 + n_planes]
        else:
            visit_ref, front_ref, vnf_ref = rest[:3]
            scratches = rest[3:3 + n_planes]
            sems = rest[3 + n_planes]
        if batch is None:
            i = pl.program_id(0)
            j = pl.program_id(1)
        else:
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
        y0 = i * bh
        x0 = j * bw
        hbm_refs = [sum_hbm, sqhi_hbm, sqlo_hbm] + (
            [tilt_hbm] if has_tilted else [])
        dmas = []
        for k, (hbm, scr) in enumerate(zip(hbm_refs, scratches)):
            src = (hbm.at[pl.ds(y0, sh), pl.ds(x0, sw)] if batch is None
                   else hbm.at[b, pl.ds(y0, sh), pl.ds(x0, sw)])
            dma = pltpu.make_async_copy(src, scr, sems.at[k])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

        s_sum, s_hi, s_lo = scratches[0], scratches[1], scratches[2]
        s_tilt = scratches[3] if has_tilted else None

        # ---- rect evaluation with a scoped row-difference cache --------
        import os
        rd_mode = int(os.environ.get("CLFD_FRONT_ROWDIFF", "1"))
        # The f32 cache is exact only while |D| <= 255*h0*(canvas_w+1)
        # < 2^24; wider canvases (> ~3.2k px at h0=20) would round the
        # cached row-diffs and could flip threshold-boundary stage
        # decisions.  There the cache stays int32 (always exact — the
        # final column subtract is still window-bounded < 2^24) and the
        # convert moves after the subtract, costing one convert per rect.
        rd_f32_exact = 255 * h0 * (Wv + 1) < 2 ** 24
        dcache = {}
        # optional second-level cache of the lane-rotated column slices
        # d[:, x:x+bw]: Haar rects are nested, so ~13% of column slices
        # within a stage repeat an (y1, y2, x) triple (frontalface_alt
        # front-12 static count).  Bit-exact (caches identical values);
        # off by default pending an on-chip measurement vs Mosaic's own
        # CSE.  CLFD_FRONT_COLCACHE=1 enables.
        colcache_on = int(os.environ.get("CLFD_FRONT_COLCACHE", "0"))
        scache = {}

        def colslice(d, dkey, x):
            if not colcache_on:
                return d[:, x:x + bw]
            k2 = dkey + (int(x),)
            v = scache.get(k2)
            if v is None:
                v = d[:, x:x + bw]
                scache[k2] = v
            return v

        def rect(scr, cy, cx):
            """Rect sum over the whole tile (4-corner signs + - - +).

            Row-difference values are cached in *float32* when exact
            (see rd_f32_exact above): this drops the per-rect int->f32
            convert — the f32 subtract of exact integers reproduces the
            XLA spec's value bit-for-bit.
            """
            upright = (cy[0] == cy[1] and cy[2] == cy[3]
                       and cx[0] == cx[2] and cx[1] == cx[3])
            if upright and rd_mode:
                key = (id(scr), int(cy[0]), int(cy[2]))
                d = dcache.get(key)
                if d is None:
                    d = scr[cy[0]:cy[0] + bh, :] - scr[cy[2]:cy[2] + bh, :]
                    if rd_f32_exact:
                        d = d.astype(jnp.float32)
                    dcache[key] = d
                out = (colslice(d, key, cx[0])
                       - colslice(d, key, cx[1]))
                return out if rd_f32_exact else out.astype(jnp.float32)
            return (scr[cy[0]:cy[0] + bh, cx[0]:cx[0] + bw]
                    - scr[cy[1]:cy[1] + bh, cx[1]:cx[1] + bw]
                    - scr[cy[2]:cy[2] + bh, cx[2]:cx[2] + bw]
                    + scr[cy[3]:cy[3] + bh, cx[3]:cx[3] + bw])

        # variance normalization (order matches _front_device exactly)
        win_sum = rect(s_sum, equ_y, equ_x).astype(jnp.float32)
        hi = rect(s_hi, equ_y, equ_x).astype(jnp.float32)
        lo = rect(s_lo, equ_y, equ_x).astype(jnp.float32)
        win_sq = hi * np.float32(256.0) + lo
        inv = np.float32(inv_area)
        mean = win_sum * inv
        var = win_sq * inv - mean * mean
        vnf = jnp.where(var >= 0, jnp.sqrt(jnp.maximum(var, 0.0)),
                        jnp.ones_like(var))

        def node_map(clf, t):
            scr = s_tilt if tables.use_tilted[clf, t] else s_sum
            v = None
            for k in range(3):
                wk = float(clf_w[clf, t, k])
                if wk == 0.0:
                    continue
                rs = rect(scr, clf_cy[clf, t, k],
                          clf_cx[clf, t, k]).astype(jnp.float32)
                term = rs * np.float32(wk)
                v = term if v is None else v + term
            return v if v is not None else jnp.zeros((bh, bw), jnp.float32)

        def clf_map(clf):
            nvals = [node_map(clf, t)
                     for t in range(int(tables.clf_valid_nodes[clf]))]

            def walk(t):
                cond = nvals[t] < np.float32(tables.threshold[clf, t]) * vnf
                lf = int(tables.left[clf, t])
                rt = int(tables.right[clf, t])
                lval = (jnp.full((bh, bw), tables.alpha[clf, -lf],
                                 jnp.float32) if lf <= 0 else walk(lf))
                rval = (jnp.full((bh, bw), tables.alpha[clf, -rt],
                                 jnp.float32) if rt <= 0 else walk(rt))
                return jnp.where(cond, lval, rval)

            return walk(0)

        def stage_pass(st, alive):
            # scope the row-diff cache per stage: bounds live VMEM ranges
            if rd_mode < 2:
                dcache.clear()
                scache.clear()
            c0 = int(spec.stage_clf_ofs[st])
            cnt = int(spec.stage_clf_cnt[st])
            ssum = jnp.zeros((bh, bw), jnp.float32)
            for jj in range(cnt):
                ssum = ssum + clf_map(c0 + jj)
            return alive & (ssum >= np.float32(stage_thresholds[st]))

        front = visit_ref[...]
        g0 = min(gate_after, front_k)
        for st in range(g0):
            front = stage_pass(st, front)
        front_ref[...] = front
        # deep stages: whole tiles die fast on natural images — predicate
        # per tile (@pl.when on the output ref; lax.cond doesn't legalize
        # in Mosaic; (8,128) sub-tile gating measured slower: narrow ops)
        for st in range(g0, front_k):
            @pl.when(jnp.any(front_ref[...]))
            def _deep(st=st):
                front_ref[...] = stage_pass(st, front_ref[...])

        vnf_ref[...] = vnf

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
    if batch is None:
        grid = (grid_h, grid_w)
        in_specs.append(pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        ospec = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        oshape = (grid_h * bh, grid_w * bw)
    else:
        grid = (batch, grid_h, grid_w)
        in_specs.append(pl.BlockSpec((bh, bw), lambda b, i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        ospec = pl.BlockSpec((None, bh, bw), lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM)
        oshape = (batch, grid_h * bh, grid_w * bw)
    out_specs = (ospec, ospec)
    out_shape = (
        jax.ShapeDtypeStruct(oshape, jnp.bool_),
        jax.ShapeDtypeStruct(oshape, jnp.float32),
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((sh, sw), jnp.int32)
                        for _ in range(n_planes)]
        + [pltpu.SemaphoreType.DMA((n_planes,))],
    )
    # NB: kept as a *numpy* array so it enters the traced program as an HLO
    # literal.  Closure-capturing a committed jax.Array (any size, even 16
    # bytes) forces this platform's runtime onto a pathological dispatch
    # path: the call itself slows ~100x and every subsequent gather/scatter
    # in the process degrades ~800x (measured; see docs/PERF.md).
    visit_dev = np.asarray(visit_pad)

    def run(planes, visit=None):
        """``visit`` overrides the baked lattice (same padded shape
        [grid_h*bh, grid_w*bw] bool) — used by the row-strip sharding
        (parallel/strips.py), where each shard passes its own strip of
        the canvas visit mask to one shared kernel instance."""
        args = [planes["sum"], planes["sq_hi"], planes["sq_lo"]]
        if has_tilted:
            args.append(planes["tilted"])
        args.append(visit_dev if visit is None else visit)
        front, vnf = call(*args)
        return front[..., :Hv, :Wv], vnf[..., :Hv, :Wv]

    return run
