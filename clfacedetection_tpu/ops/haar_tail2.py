"""Pallas TPU kernel: survivor tail with the cascade walk *inside* the
kernel (stump cascades).

The v1 tail (ops/haar_tail.py) extracts per-survivor patches and runs ONE
stencil matmul over every remaining node, streaming a [cap, n_nodes] f32
matrix back to HBM for XLA to turn into votes / stage sums.  That shape
has two structural costs the reference's per-window kernel
(clod.cl:52-80) never pays:

* no early exit — a survivor that dies at the first tail stage still gets
  every later node evaluated (at front_k=8 on 1080p that is ~88% wasted
  matmul columns), and
* the node-value matrix round-trips HBM (~460 MB at 53k survivors) before
  the XLA vote pass touches it.

This kernel keeps the walk on-chip: the remaining stages are partitioned
into lane-aligned COLUMN GROUPS of the resident stencil; each survivor
chunk runs matmul -> votes -> stage sums -> alive/level/weight updates
group by group, and a chunk whose 64 survivors are all dead skips every
remaining group (`pl.when` on the reduced alive lane).  Output is one
[capP, 128] row per survivor (alive flag, exit stage, exit-stage sum)
instead of [capP, n_nodes] — the ROC fields come for free.

Specialized to the zoo's common case: stump cascades (T == 1), sequential
(non-tree) stage order, no tilted features, and a stencil small enough to
stay VMEM-resident (frontalface_alt & friends).  Everything else keeps
the v1 kernel or the XLA specification path.

Variance normalization: the per-survivor factor is read from the front
pass's vnf map via a second band DMA, so the vote compare is the exact
XLA expression `node_val < threshold * vnf` — no rescaling tricks that
would perturb threshold-boundary decisions.

Reference analog: clodDetectObjects' per-window cascade loop with early
stage exit (clod.cl:52-93); the band/patch machinery is shared with the
v1 kernel (see ops/haar_tail.py for the Mosaic constraints that shaped
it).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .haar_tail import patch_rows

__all__ = ["build_tail2_kernel", "plan_stage_groups", "plan_tail2_bands",
           "chunk_tables"]


def chunk_tables(cnt, nb: int, chunk: int, cap: int):
    """Flattened chunk -> (band, local chunk) maps for a 1-D chunk grid.

    A (band, chunk) 2-D grid must provision cap/chunk chunks in EVERY
    band, so bands holding few survivors leave most grid steps dead —
    and a dead Mosaic grid step still costs ~5 us on v5e (measured:
    growing cap 8k -> 16k at fixed ~6.5k survivors added 2.9 ms for 538
    extra dead steps).  Flattening to one global chunk axis sized
    cap/chunk + nb makes the number of dead steps independent of how
    survivors distribute over bands.  All jnp ops (runs in the compact
    phase); returns ([nch_total] band index, [nch_total] local chunk).
    """
    nch_total = -(-cap // chunk) + nb
    chunks_b = -(-cnt // chunk)                    # [nb]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(chunks_b).astype(jnp.int32)])
    t = jnp.arange(nch_total, dtype=jnp.int32)
    cb = jnp.clip(jnp.searchsorted(starts, t, side="right") - 1,
                  0, nb - 1).astype(jnp.int32)
    cj = t - starts[cb]
    return cb, cj

_BUDGET_WORDS = 12_000_000 // 4


@dataclasses.dataclass(frozen=True)
class _StageGroup:
    col0: int                      # first lane of the group (128-aligned)
    width: int                     # lanes in the group (multiple of 128)
    # (stage index, local lane lo, local lane hi, stage threshold)
    stages: Tuple[Tuple[int, int, int, float], ...]


def plan_stage_groups(stage_cnt, stage_thr, front_k: int, n_stages: int,
                      group_target: int = 384) -> List[_StageGroup]:
    """Pack stages [front_k, n_stages) into lane groups of ~group_target
    columns, each padded to a 128 multiple (MXU/VPU lane tiling)."""
    groups: List[_StageGroup] = []
    cur: List[Tuple[int, int, int, float]] = []
    cur_w = 0
    col0 = 0

    def flush():
        nonlocal cur, cur_w, col0
        if not cur:
            return
        width = -(-cur_w // 128) * 128
        groups.append(_StageGroup(col0, width, tuple(cur)))
        col0 += width
        cur, cur_w = [], 0

    for s in range(front_k, n_stages):
        cnt = int(stage_cnt[s])
        if cur and cur_w + cnt > group_target:
            flush()
        cur.append((s, cur_w, cur_w + cnt, float(stage_thr[s])))
        cur_w += cnt
    flush()
    return groups


def plan_tail2_bands(hv: int, band_w: int, nn_pad: int, rows: int,
                     chunk: int) -> Optional[Tuple[int, int]]:
    """(n_bands, band_rows) sized so resident stencil + TWO bands (integral
    plane + vnf map) + scratch fit the VMEM budget; None if impossible."""
    load_rows = 32 if rows + 8 <= 32 else 64
    fixed = (32 * rows * nn_pad      # resident stencil
             + 8 * nn_pad            # thr / alpha rows
             + chunk * 32 * rows     # patches
             + chunk * 128)          # state
    avail = _BUDGET_WORDS - fixed
    r = (avail // (2 * band_w) - load_rows) // 8 * 8
    r = min(r, 576)
    if r < 8:
        return None
    nb = max(1, -(-hv // r))
    r = -(-hv // (nb * 8)) * 8
    return nb, r


def build_tail2_kernel(sten_rows: np.ndarray,      # [32*rows, n_cols]
                       thresholds: np.ndarray,     # [n_cols] f32
                       alpha_l: np.ndarray,        # [n_cols] f32
                       alpha_r: np.ndarray,        # [n_cols] f32
                       stage_ofs, stage_cnt, stage_thr,
                       front_k: int, n_stages: int,
                       plane_shape: Tuple[int, int],
                       hv: int, wv: int, cap: int,
                       p_h: int = 21,
                       chunk: int = 64,
                       batch: Optional[int] = None,
                       group_target: int = 384):
    """Returns fn(plane, vnf_pad, slot_yx, alo, cnt) -> out [.., capP, 128]
    (lane 0: vnf, 1: alive, 2: exit stage, 3: exit-stage sum), or ``None``
    when the plan doesn't fit VMEM (caller falls back to the v1 kernel).

    ``sten_rows`` covers the WHOLE cascade in classifier order (same
    remapped layout as v1); only columns of stages >= front_k are copied
    into the grouped resident stencil.
    """
    if front_k >= n_stages:
        return None
    hp, wp = plane_shape
    rows = patch_rows(p_h)
    load_rows = 32 if rows + 8 <= 32 else 64
    band_w = ((wv - 1) // 128) * 128 + 256
    if wp < band_w:
        return None
    groups = plan_stage_groups(stage_cnt, stage_thr, front_k, n_stages,
                               group_target)
    nn_pad = groups[-1].col0 + groups[-1].width
    plan = plan_tail2_bands(hv, band_w, nn_pad, rows, chunk)
    if plan is None:
        return None
    nb, r = plan
    if hp < nb * r + load_rows:
        return None
    nch = -(-cap // chunk)
    capp = cap + nb * chunk
    capp_pad = -(-capp // 8) * 8

    # grouped-resident stencil + per-column params (rows 0: thr, 1: left
    # alpha, 2: right alpha) — numpy literals (HLO constants; a captured
    # jax.Array would poison the dispatch path, see ops/haar_front.py)
    sten_g = np.zeros((32 * rows, nn_pad), np.float32)
    cpar = np.zeros((8, nn_pad), np.float32)
    for g in groups:
        for (s, sl, sh, _thr) in g.stages:
            c0 = int(stage_ofs[s])
            src = slice(c0, c0 + (sh - sl))
            dst = slice(g.col0 + sl, g.col0 + sh)
            sten_g[:, dst] = sten_rows[:, src]
            cpar[0, dst] = thresholds[src]
            cpar[1, dst] = alpha_l[src]
            cpar[2, dst] = alpha_r[src]

    def kernel(syx_ref, cb_ref, cj_ref, lo_ref, cnt_ref, plane_hbm,
               vnf_hbm, sten, cp, out_hbm, band, vband, patches, state,
               sems):
        if batch is None:
            t = pl.program_id(0)
            fr = None
            b = cb_ref[t]
            j = cj_ref[t]
            lo = lo_ref[b]
            hi = lo + cnt_ref[b]
        else:
            fr = pl.program_id(0)
            t = pl.program_id(1)
            b = cb_ref[fr, t]
            j = cj_ref[fr, t]
            lo = lo_ref[fr, b]
            hi = lo + cnt_ref[fr, b]
        start = ((lo + j * chunk) // 8) * 8

        # one outer guard: dead grid steps (start >= hi) fall straight
        # through — a dead Mosaic step still costs ~5 us, so the flat
        # chunk grid (see chunk_tables) keeps their count minimal
        @pl.when(start < hi)
        def _body():
            @pl.when(j == 0)
            def _dma_bands():
                for hbm, scr, sem in ((plane_hbm, band, 0),
                                      (vnf_hbm, vband, 2)):
                    src = (hbm.at[pl.ds(b * r, r + load_rows),
                                  pl.ds(0, band_w)]
                           if batch is None else
                           hbm.at[fr, pl.ds(b * r, r + load_rows),
                                  pl.ds(0, band_w)])
                    dma = pltpu.make_async_copy(src, scr, sems.at[sem])
                    dma.start()
                    dma.wait()

            for i in range(chunk):
                g = start + i
                ok = g < hi
                v = syx_ref[fr, g] if batch is not None else syx_ref[g]
                yg = v // 65536
                y = jnp.where(ok, yg - b * r, 0)
                x = jnp.where(ok, v - yg * 65536, 0)
                ya = (y // 8) * 8
                xa = (x // 128) * 128
                raw = band[pl.ds(ya, load_rows), pl.ds(xa, 256)]
                raw = pltpu.roll(raw, -(y - ya), axis=0)
                raw = raw[:rows, :]
                raw = pltpu.roll(raw, -(x - xa), axis=1)
                blk = raw[:, :32]
                corr = (blk - blk[0:1, :] - blk[:, 0:1] + blk[0, 0]
                        ).astype(jnp.float32)
                for dy in range(rows):
                    patches[i, 32 * dy:32 * dy + 32] = corr[dy, :]
                # per-survivor variance factor from the vnf band: one
                # aligned (8, 128) load + two pow2 rolls -> lane 0
                ya8 = (y // 8) * 8
                vb = vband[pl.ds(ya8, 8), pl.ds(xa, 128)]
                vb = pltpu.roll(vb, -(y - ya8), axis=0)
                vb = pltpu.roll(vb, -(x - xa), axis=1)
                state[i, 0:1] = vb[0, 0:1]
            ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            state[:, 1:2] = jnp.where(start + ii < hi, 1.0, 0.0)
            state[:, 2:3] = jnp.full((chunk, 1), float(n_stages),
                                     jnp.float32)
            state[:, 3:4] = jnp.zeros((chunk, 1), jnp.float32)

            for grp in groups:
                @pl.when(jnp.max(state[:, 1:2]) > 0.0)
                def _group(grp=grp):
                    # precision=HIGHEST: the MXU default demotes f32 to
                    # bf16, whose 8-bit mantissa wrecks integral patches
                    acc = jnp.dot(patches[...],
                                  sten[:, grp.col0:grp.col0 + grp.width],
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                    svnf = state[:, 0:1]
                    csl = slice(grp.col0, grp.col0 + grp.width)
                    # exact XLA vote expression: val < thr * vnf -> left
                    cond = acc < cp[0:1, csl] * svnf
                    vote = jnp.where(cond, cp[1:2, csl], cp[2:3, csl])
                    alive = state[:, 1:2]
                    level = state[:, 2:3]
                    weight = state[:, 3:4]
                    for (s, sl, sh, sthr) in grp.stages:
                        ssum = jnp.sum(vote[:, sl:sh], axis=1,
                                       keepdims=True)
                        entering = alive > 0.0
                        # the reference reports the sum of the stage a
                        # window exits at (tempcv.cpp:1084-1088)
                        weight = jnp.where(entering, ssum, weight)
                        spass = ssum >= np.float32(sthr)
                        level = jnp.where(entering & ~spass,
                                          np.float32(s), level)
                        alive = jnp.where(spass, alive, 0.0)
                    state[:, 1:2] = alive
                    state[:, 2:3] = level
                    state[:, 3:4] = weight

            dst = (out_hbm.at[pl.ds(start, chunk), :] if batch is None
                   else out_hbm.at[fr, pl.ds(start, chunk), :])
            dma = pltpu.make_async_copy(state, dst, sems.at[1])
            dma.start()
            dma.wait()

    nch_total = -(-cap // chunk) + nb
    grid = (nch_total,) if batch is None else (batch, nch_total)
    const_idx = (lambda *idx: (0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),       # plane
        pl.BlockSpec(memory_space=pl.ANY),       # vnf
        pl.BlockSpec((32 * rows, nn_pad), const_idx,
                     memory_space=pltpu.VMEM),      # stencil (resident)
        pl.BlockSpec((8, nn_pad), const_idx,
                     memory_space=pltpu.VMEM),      # thr/alpha rows
    ]
    scratch = [
        pltpu.VMEM((r + load_rows, band_w), jnp.int32),
        pltpu.VMEM((r + load_rows, band_w), jnp.float32),
        pltpu.VMEM((chunk, 32 * rows), jnp.float32),
        pltpu.VMEM((chunk, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    oshape = ((capp_pad, 128) if batch is None
              else (batch, capp_pad, 128))
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct(oshape,
                                                         jnp.float32))

    def run(plane, vnf_pad, slot_yx, cb, cj, alo, cnt):
        return call(slot_yx, cb, cj, alo, cnt, plane, vnf_pad,
                    sten_g, cpar)[..., :capp, :]

    run.n_bands, run.band_rows, run.capp = nb, r, capp
    run.load_rows, run.band_w = load_rows, band_w
    return run
