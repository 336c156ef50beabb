"""Pallas TPU kernel: ordered stream compaction of a boolean canvas mask.

The static-shape replacement for the reference's atomically-appended
survivor worklists (clod.cl:85-91): emit the (raster-ordered) flat indices
of the first ``cap`` set bits of a [H, W] mask, plus the total count.

XLA formulations are element-rate-bound on TPU (scatter ~5 ns/element over
the WHOLE mask; nonzero lowers to a full sort) — ~30 ms on a 5M canvas.
This kernel is survivor-bound instead:

* sequential grid over 8-row bands; a running count lives in SMEM scratch
  (TPU grid steps run in order and scratch persists), empty bands cost a
  reduction and nothing else;
* set bits are extracted in raster order by iterated min-index reduction
  over the band tile (vector reduces, no data-dependent memory ops);
* Mosaic forbids vector stores at unaligned dynamic lane offsets, so
  survivors accumulate into an [8, 128] one-hot staging block (one
  compare+select per survivor) that is flushed to an aligned output row
  whenever 1024 slots fill (and once at the end).

Cost ~ O(bands + survivors), independent of canvas area.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_compact_kernel"]

_BLK = 1024  # staging block = one (8, 128) vreg of slots


def build_compact_kernel(n_rows: int, n_cols: int, cap: int,
                         band: int = 8):
    """Returns fn(mask bool[n_rows, n_cols]) -> (idx i32[cap], n i32):
    ``idx`` = flat raster indices of the first ``cap`` True entries (padded
    with n_rows*n_cols), ``n`` = total True count.  ``cap`` is rounded up
    to a multiple of 1024 internally."""
    n_bands = -(-n_rows // band)
    wpad = -(-n_cols // 128) * 128
    n_total = n_rows * n_cols
    capb = -(-cap // _BLK)          # output rows of 1024 slots
    big = np.int32(np.iinfo(np.int32).max)

    slot_iota = None  # built in-kernel (2D iota)

    def kernel(mask_ref, idx_ref, cnt_ref, count_sm, staging):
        b = pl.program_id(0)
        slot2d = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))

        @pl.when(b == 0)
        def _init():
            idx_ref[...] = jnp.full(idx_ref.shape, n_total, jnp.int32)
            staging[...] = jnp.full((8, 128), n_total, jnp.int32)
            count_sm[0] = 0

        tile = mask_ref[...]                      # [band, wpad] bool
        lin = (jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0) * wpad
               + jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1))
        keyed0 = jnp.where(tile, lin, big)
        n_tile = jnp.sum(tile.astype(jnp.int32))

        @pl.when(n_tile > 0)
        def _extract():
            base = count_sm[0]

            def body(i, keyed):
                pos = jnp.min(keyed)              # next set bit, raster order
                r = pos // wpad
                c = pos - r * wpad
                flat = (b * band + r) * n_cols + c
                slot = base + i
                blkpos = jnp.remainder(slot, _BLK)
                st = jnp.where(slot2d == blkpos, flat, staging[...])
                staging[...] = st

                @pl.when((blkpos == _BLK - 1) & (slot < capb * _BLK))
                def _flush():
                    row = slot // _BLK
                    idx_ref[pl.ds(row, 1), :] = \
                        staging[...].reshape(1, _BLK)
                    staging[...] = jnp.full((8, 128), n_total, jnp.int32)

                return jnp.where(keyed == pos, big, keyed)

            jax.lax.fori_loop(0, n_tile, body, keyed0)
            count_sm[0] = base + n_tile

        @pl.when(b == pl.num_programs(0) - 1)
        def _fin():
            total = count_sm[0]
            row = total // _BLK

            @pl.when((jnp.remainder(total, _BLK) > 0) & (row < capb))
            def _flush_tail():
                idx_ref[pl.ds(row, 1), :] = staging[...].reshape(1, _BLK)

            cnt_ref[0, 0] = total

    call = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec((band, wpad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((capb, _BLK), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((capb, _BLK), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)],
    )

    mask_pad_rows = n_bands * band

    def run(mask2d):
        m = jnp.zeros((mask_pad_rows, wpad), bool)
        m = jax.lax.dynamic_update_slice(m, mask2d, (0, 0))
        idx, cnt = call(m)
        return idx.reshape(-1)[:cap], cnt[0, 0]

    return run
