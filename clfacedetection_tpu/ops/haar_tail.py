"""Pallas TPU kernel: per-survivor Haar patch extraction + stencil matmul.

The tail phase evaluates every cascade node on each compacted front
survivor.  The XLA formulation (vmap-of-dynamic_slice gather, see
detect/pyramid.py:_tail_accept_chunk) is element-rate bound on TPU
(~0.27 G elem/s -> ~1.7 us per 21x21 window; 27 ms at cap 16k), because
XLA lowers the patch gather to per-element accesses.  This kernel does
the same job in ~3.5 ms by keeping the canvas rows in VMEM and letting
the MXU do the arithmetic:

* Survivors arrive raster-ordered from compaction, so a partition of the
  canvas into row *bands* makes each band's survivors one contiguous
  slot range.  The compact phase lays survivors out in **band-aligned
  slots** (each band's range starts at a chunk-aligned slot) and passes
  the per-band start/count as scalar-prefetch arrays.
* Grid = (band, chunk).  The first active chunk of a band DMAs the
  band's (R+24)-row window of the integral plane HBM->VMEM; chunks then
  extract their <=C survivors' (21, 21) patches with aligned vector
  loads + dynamic rolls (pltpu.roll handles the sub-tile offsets; Mosaic
  rejects unaligned dynamic loads/stores, so the chunk loop is unrolled
  with static store indices).
* Patches are stored one window row per lane group (K index =
  lanes*dy + dx; lanes = 32, or 64 for windows wider than 31 px like
  mcs_eyepair_big's 45x11) and hit the MXU as one [C, lanes*rows] x
  [lanes*rows, n_nodes] f32 matmul against the resident stencil (the
  same signed corner-weight matrix as the XLA path, rows remapped);
  node values stream back to HBM per chunk.

Replaces the reference's per-window per-stage scalar loops
(clod.cl:52-80) at ~0.2 us/window all-nodes; votes / stage sums / CART
walks stay in XLA on the kernel's output (cheap dense ops).

Bit-exactness: integer patch corrections are exact; the matmul is f32
with MXU accumulation order, matching the XLA tail to ~1e-3 relative
(accumulation-order noise only — same equivalence class as the XLA f32
fast path vs the float64 oracle).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_tail_kernel", "remap_stencil_rows", "plan_bands",
           "band_slots", "patch_rows"]

def patch_rows(p_h: int) -> int:
    """Patch rows padded to the sublane tile (24 for 20x20 windows,
    32 for 24x24)."""
    return -(-p_h // 8) * 8


def patch_lanes(p_w: int) -> int:
    """Patch lane width: 32 for windows up to 31 px, 64 up to 63 px
    (the wide mcs_eyepair_big case, 45x11)."""
    assert p_w <= 64
    return 32 if p_w <= 32 else 64


def remap_stencil_rows(sten: np.ndarray, p_h: int, p_w: int) -> np.ndarray:
    """[(p_h*p_w), N] stencil -> [lanes*patch_rows, N], row dy at
    lanes*dy+dx (lanes = patch_lanes(p_w))."""
    rows = patch_rows(p_h)
    lanes = patch_lanes(p_w)
    assert p_h <= rows and p_w <= lanes
    n = sten.shape[1]
    out = np.zeros((lanes * rows, n), np.float32)
    for dy in range(p_h):
        out[lanes * dy:lanes * dy + p_w] = sten[dy * p_w:(dy + 1) * p_w]
    return out


def plan_bands(hv: int, r_max: int = 576) -> Tuple[int, int]:
    """(n_bands, band_rows): minimal 8-aligned band height <= r_max."""
    nb = max(1, -(-hv // r_max))
    r = -(-hv // (nb * 8)) * 8
    return nb, r


def band_slots(surv_idx, w_log: int, n_flat: int, n_bands: int, r: int,
               chunk: int, cap: int):
    """Band-aligned slot layout for raster-ordered survivor indices.

    Returns (slot_y, slot_x, slot_valid, alo, cnt, overflow_free_slots):
    per-slot canvas coords + validity over ``capP = cap + n_bands*chunk``
    slots, plus the per-band aligned starts / counts the kernel prefetches.
    All jnp ops (runs inside the compact jit phase).
    """
    capp = cap + n_bands * chunk
    valid = surv_idx < n_flat
    sy = jnp.where(valid, surv_idx // w_log, n_bands * r)
    sx = jnp.where(valid, surv_idx % w_log, 0)
    bounds = jnp.searchsorted(sy, jnp.arange(n_bands + 1) * r)
    cnt = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    aligned = -(-cnt // chunk) * chunk
    alo = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(aligned)[:-1].astype(jnp.int32)])
    band = jnp.clip(sy // r, 0, n_bands - 1)
    slot = jnp.where(valid, alo[band] + jnp.arange(cap) - bounds[band],
                     capp)
    z = jnp.zeros((capp + 1,), jnp.int32)
    slot_y = z.at[slot].set(sy.astype(jnp.int32), mode="drop")[:capp]
    slot_x = z.at[slot].set(sx.astype(jnp.int32), mode="drop")[:capp]
    slot_valid = jnp.zeros((capp + 1,), bool).at[slot].set(
        valid, mode="drop")[:capp]
    slot_idx = jnp.full((capp + 1,), n_flat, jnp.int32).at[slot].set(
        surv_idx.astype(jnp.int32), mode="drop")[:capp]
    return slot_y, slot_x, slot_valid, slot_idx, alo, cnt


def build_tail_kernel(sten_rows: np.ndarray, plane_shape: Tuple[int, int],
                      hv: int, wv: int, cap: int,
                      p_h: int = 21,
                      p_w: int = 21,
                      chunk: int = 64,
                      r_max: int = 576,
                      batch: Optional[int] = None,
                      sten_tilt_rows: Optional[np.ndarray] = None):
    """Returns fn(plane, slot_yx, alo, cnt[, tilt_plane]) -> vals.

    ``sten_rows`` is the remapped [32*rows, NN] stencil; ``plane_shape``
    the padded integral plane (must be at least ``band_w`` wide and
    ``n_bands*r + load_rows`` tall); survivors come slot-laid-out per
    :func:`band_slots`.  ``batch`` prepends a frame dimension to
    plane/slots/vals (one more grid axis).  ``sten_tilt_rows`` adds the
    45-degree path: a second band holds the rotated integral (RSAT) and
    each survivor's tilted patch — corner-only correction, the four
    tilted corners have distinct dx/dy so only the constant term cancels
    (tempcv.cpp:743-750) — feeds a second accumulated matmul.
    """
    hp, wp = plane_shape
    rows = patch_rows(p_h)
    lanes = patch_lanes(p_w)
    # load height must cover rows + the y%8 sublane misalignment AND be a
    # power of two: pltpu.roll with a *dynamic* shift silently corrupts
    # non-power-of-two sublane counts (40/48 rows wrong, 32/64 correct —
    # measured on v5e; the lowering appears to assume pow2 log-shifts)
    load_rows = 32 if rows + 8 <= 32 else 64
    nb, r = plan_bands(hv, r_max)
    assert hp >= nb * r + load_rows, (hp, nb, r)
    assert sten_rows.shape[0] == lanes * rows
    band_w = ((wv - 1) // 128) * 128 + 256
    assert wp >= band_w, (wp, band_w)
    nn = sten_rows.shape[1]
    nch = -(-cap // chunk)
    capp = cap + nb * chunk
    capp_pad = -(-capp // 8) * 8
    # NN blocking: keep resident stencil block + band + chunk buffers
    # within the VMEM budget (large cascades like frontalface_default,
    # 2913 nodes x 32 patch rows, need the stencil split over the grid).
    # A single constant-index stencil block is fetched once; a varying
    # block index makes Mosaic double-buffer it (2x VMEM), so the
    # blocked case budgets the stencil twice.
    import os
    tilted = sten_tilt_rows is not None
    n_sten = 2 if tilted else 1
    budget = 12_000_000 // 4
    fixed = (n_sten * (r + load_rows) * band_w
             + n_sten * chunk * lanes * rows)
    if n_sten * lanes * rows * nn + fixed + chunk * nn <= budget:
        nnb = nn
    else:
        nnb = ((budget - fixed)
               // (n_sten * 2 * lanes * rows + chunk)) // 128 * 128
        if nnb < 128:
            # the fixed footprint (bands + patch scratch) alone busts the
            # VMEM budget — e.g. a tilted cascade on a very wide canvas
            # doubles the band scratch.  Emitting the call anyway would
            # fail at Mosaic compile time; signal the caller to fall back
            # to the XLA tail instead.
            return None
        nnb = min(nn, nnb)
    if os.environ.get("CLFD_TAIL_NNB"):      # debug override
        nnb = min(nn, int(os.environ["CLFD_TAIL_NNB"]))
    nkb = -(-nn // nnb)
    nn_pad = nkb * nnb

    def kernel(syx_ref, lo_ref, cnt_ref, *refs):
        if tilted:
            (plane_hbm, tilt_hbm, sten, sten_t, out_hbm,
             band, band_t, patches, patches_t, vals, sems) = refs
        else:
            plane_hbm, sten, out_hbm, band, patches, vals, sems = refs
            tilt_hbm = band_t = patches_t = sten_t = None
        if batch is None:
            b = pl.program_id(0)
            j = pl.program_id(1)
            kb = pl.program_id(2)
            fr = None
        else:
            fr = pl.program_id(0)
            b = pl.program_id(1)
            j = pl.program_id(2)
            kb = pl.program_id(3)
        lo = lo_ref[fr, b] if batch is not None else lo_ref[b]
        hi = lo + (cnt_ref[fr, b] if batch is not None else cnt_ref[b])
        # lo is chunk-aligned by construction; the //8*8 idiom makes the
        # alignment provable for Mosaic's DMA index checks
        start = ((lo + j * chunk) // 8) * 8

        @pl.when((j == 0) & (kb == 0) & (start < hi))
        def _dma_band():
            pairs = [(plane_hbm, band, 0)]
            if tilted:
                pairs.append((tilt_hbm, band_t, 2))
            for hbm, scr, sem in pairs:
                src = (hbm.at[pl.ds(b * r, r + load_rows),
                              pl.ds(0, band_w)]
                       if batch is None else
                       hbm.at[fr, pl.ds(b * r, r + load_rows),
                              pl.ds(0, band_w)])
                dma = pltpu.make_async_copy(src, scr, sems.at[sem])
                dma.start()
                dma.wait()

        @pl.when((kb == 0) & (start < hi))
        def _extract():
            for i in range(chunk):
                g = start + i
                ok = g < hi
                # (y, x) packed into one int32 (y*65536 + x): the
                # scalar-prefetch operands live in 1MB SMEM, and two
                # [batch, capP] arrays overflow it at batch 8
                v = syx_ref[fr, g] if batch is not None else syx_ref[g]
                yg = v // 65536
                y = jnp.where(ok, yg - b * r, 0)
                x = jnp.where(ok, v - yg * 65536, 0)
                ya = (y // 8) * 8
                xa = (x // 128) * 128

                def load_blk(scr):
                    raw = scr[pl.ds(ya, load_rows), pl.ds(xa, 256)]
                    raw = pltpu.roll(raw, -(y - ya), axis=0)
                    raw = raw[:rows, :]
                    raw = pltpu.roll(raw, -(x - xa), axis=1)
                    return raw[:, :lanes]

                blk = load_blk(band)
                # window-local correction (exact in int32; rows >= p_h
                # and lanes >= p_w are garbage zeroed by the stencil)
                corr = (blk - blk[0:1, :] - blk[:, 0:1] + blk[0, 0]
                        ).astype(jnp.float32)
                for dy in range(rows):
                    patches[i, lanes * dy:lanes * dy + lanes] = corr[dy, :]
                if tilted:
                    tbk = load_blk(band_t)
                    # corner-only correction: tilted corners have four
                    # distinct offsets, only the constant term cancels
                    tco = (tbk - tbk[0, 0]).astype(jnp.float32)
                    for dy in range(rows):
                        patches_t[i, lanes * dy:lanes * dy + lanes] = \
                            tco[dy, :]

        @pl.when(start < hi)
        def _matmul():
            # precision=HIGHEST: the MXU default demotes f32 operands to
            # bf16, whose 8-bit mantissa wrecks integral-patch values
            # (same cliff as the XLA tail, pyramid.py:_tail_accept_chunk)
            acc = jnp.dot(patches[...], sten[...],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
            if tilted:
                acc = acc + jnp.dot(patches_t[...], sten_t[...],
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
            vals[...] = acc
            dst = (out_hbm.at[pl.ds(start, chunk), pl.ds(kb * nnb, nnb)]
                   if batch is None else
                   out_hbm.at[fr, pl.ds(start, chunk),
                              pl.ds(kb * nnb, nnb)])
            dma = pltpu.make_async_copy(vals, dst, sems.at[1])
            dma.start()
            dma.wait()

    grid = ((nb, nch, nkb) if batch is None
            else (batch, nb, nch, nkb))
    sten_spec = pl.BlockSpec((lanes * rows, nnb),
                             lambda *idx: (0, idx[len(grid) - 1]),
                             memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if tilted:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    in_specs.append(sten_spec)
    if tilted:
        in_specs.append(pl.BlockSpec((lanes * rows, nnb),
                                     lambda *idx: (0, idx[len(grid) - 1]),
                                     memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((r + load_rows, band_w), jnp.int32)]
    if tilted:
        scratch.append(pltpu.VMEM((r + load_rows, band_w), jnp.int32))
    scratch.append(pltpu.VMEM((chunk, lanes * rows), jnp.float32))
    if tilted:
        scratch.append(pltpu.VMEM((chunk, lanes * rows), jnp.float32))
    scratch.append(pltpu.VMEM((chunk, nnb), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    oshape = ((capp_pad, nn_pad) if batch is None
              else (batch, capp_pad, nn_pad))
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct(oshape,
                                                         jnp.float32))
    sten_pad = np.zeros((lanes * rows, nn_pad), np.float32)
    sten_pad[:, :nn] = sten_rows
    if tilted:
        sten_t_pad = np.zeros((lanes * rows, nn_pad), np.float32)
        sten_t_pad[:, :nn] = sten_tilt_rows

    def run(plane, slot_yx, alo, cnt, tilt_plane=None):
        if tilted:
            return call(slot_yx, alo, cnt, plane, tilt_plane,
                        sten_pad, sten_t_pad)[..., :capp, :nn]
        return call(slot_yx, alo, cnt, plane,
                    sten_pad)[..., :capp, :nn]

    run.n_bands, run.band_rows, run.capp = nb, r, capp
    return run
