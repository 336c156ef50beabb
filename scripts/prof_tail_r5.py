#!/usr/bin/env python
"""Round-5 tail decomposition (VERDICT r4 item 3): where do the ~4 ms
between the tail's per-survivor cost model (18.4k x 0.4 us = 7.4 ms) and
its measured ~11 ms go?

Hypotheses measured here, at the bench config (1080p photo scene,
frontalface_alt, fk=10, batch 8):

  A  dead provisioned chunk steps: the flat chunk grid provisions
     cap/chunk + nb steps; at cap 32768 with ~18.4k survivors, ~230
     steps/frame fall through dead at ~5 us each (~1.2 ms/frame x batch)
     -> time the identical pipeline at cap 20480 (still > n_surv, no
     regrowth) and 24576; the delta per dead step is the measured cost.
  B  band-local partial fill: the last chunk of each band runs partially
     filled -> read the per-band survivor counts and compute the exact
     padded-slot overhead ((chunk - cnt % chunk) % chunk summed over
     bands; expected ~1-2% of survivors, i.e. NOT the 4 ms).
  C  per-chunk fixed cost (the serial 64-iteration patch-extraction
     loop) -> chunk 32 vs 64 at fixed cap re-measured for reference.

Run on an otherwise-idle host (PERF.md measurement rules).
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.runtime import BatchedPyramidDetector
from clfacedetection_tpu.utils import photo_scene


def dev_ms(det, frames, reps=10):
    dv = det.put(frames)
    out = det.run_device(dv)
    np.asarray(out["packed"][:, :2])
    xs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = det.run_device(dv)
        np.asarray(out["packed"][:, :2])
        xs.append((time.perf_counter() - t0) / (reps * len(frames)) * 1e3)
    return statistics.median(xs), min(xs)


def main():
    batch = int(os.environ.get("CLFD_PROF_BATCH", "8"))
    spec = load_cascade("haarcascade_frontalface_alt")
    frame = photo_scene((1080, 1920))
    frames = np.broadcast_to(frame, (batch,) + frame.shape).copy()

    # B: per-band survivor counts + exact partial-fill overhead
    det = BatchedPyramidDetector(spec, frame.shape, batch, min_size=(40, 40),
                                 front_stages=10, cap=32768)
    det.detect(frames, min_neighbors=3)
    pdet = det.det
    kernel = pdet._tail2_kernel_for(batch)
    if kernel is not None:
        import jax.numpy as jnp
        from clfacedetection_tpu.ops.haar_tail import band_slots
        shape = (pdet.plan.canvas_h + 1, pdet.plan.canvas_w + 1)
        n_flat = shape[0] * shape[1]
        nb, r = kernel.n_bands, kernel.band_rows

        def counts(g):
            f = pdet._front_device_batch(g)
            surv_idx, n_surv = jax.vmap(pdet._compact_device)(f["front"])
            out = jax.vmap(lambda s: band_slots(
                s, shape[1], n_flat, nb, r, pdet.tail_chunkk,
                pdet.cap)[5])(surv_idx)
            return out, n_surv

        cnt, n_surv = jax.jit(counts)(det.put(frames))
        cnt = np.asarray(cnt)[0]
        ns = int(np.asarray(n_surv)[0])
        ch = pdet.tail_chunkk
        pad = int(((ch - cnt % ch) % ch).sum())
        print(f"# bands={nb} r={r} chunk={ch} n_surv={ns}")
        print(f"# per-band cnt: {cnt.tolist()}")
        print(f"# partial-fill padded slots: {pad} "
              f"({pad / max(ns, 1) * 100:.1f}% of survivors)")
        live_chunks = int((-(-cnt // ch)).sum())
        prov = pdet.cap // ch + nb
        print(f"# live chunks {live_chunks} / provisioned {prov} "
              f"-> dead steps {prov - live_chunks}")

    # A: cap sweep (dead-step isolation).  All caps > n_surv: identical
    # work, different provisioned grids.
    for cap in (32768, 24576, 20480):
        try:
            d = BatchedPyramidDetector(spec, frame.shape, batch,
                                       min_size=(40, 40), front_stages=10,
                                       cap=cap)
            d.detect(frames, min_neighbors=3)
            med, mn = dev_ms(d, frames)
            prov = cap // d.det.tail_chunkk
            print(f"A cap {cap:6d}: {med:6.2f} ms/frame (min {mn:.2f}), "
                  f"~{prov} provisioned chunks", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"A cap {cap}: FAILED {e}", flush=True)

    # C: chunk sweep at fixed cap (per-chunk fixed cost, re-measured)
    for chunkk in (32, 64, 128):
        try:
            os.environ["CLFD_TAIL_CHUNKK"] = str(chunkk)
            d = BatchedPyramidDetector(spec, frame.shape, batch,
                                       min_size=(40, 40), front_stages=10,
                                       cap=20480)
            d.detect(frames, min_neighbors=3)
            med, mn = dev_ms(d, frames)
            print(f"C chunk {chunkk:4d} (cap 20480): {med:6.2f} ms/frame "
                  f"(min {mn:.2f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"C chunk {chunkk}: FAILED {e}", flush=True)
        finally:
            os.environ.pop("CLFD_TAIL_CHUNKK", None)


if __name__ == "__main__":
    main()
