#!/usr/bin/env python
"""Round-5 tail sub-batch isolation (follow-up to prof_tail_r5.py).

prof_tail_r5 found cap 24576/20480 run 10-12 ms/frame SLOWER than cap
32768 at identical survivors — the opposite of the dead-step model.
The structural difference is the sub-batch split (pyramid.py
_tail_device_batch): at batch 8, cap 32768's slot table (8 x 33152 x 4
= 1.06 MB) exceeds the 900 KB bound and splits into two batch-4
launches (530 KB tables each), while cap 24576's single batch-8 launch
carries a 798 KB table — close to the 1 MB SMEM ceiling.

This script isolates the mechanism with CLFD_TAIL_SUB_WORDS:
  1. cap 24576, bound 500k -> sub 4: if the slowdown vanishes, the
     near-SMEM single launch IS the mechanism (not cap itself);
  2. cap 32768, bound 250k/125k -> sub 2/1: does shrinking the
     per-launch table below 530 KB buy anything more?

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


def run(cap, bound, batch=8):
    os.environ["CLFD_TAIL_SUB_WORDS"] = str(bound)
    try:
        spec = load_cascade("haarcascade_frontalface_alt")
        frame = photo_scene((1080, 1920))
        frames = np.broadcast_to(frame, (batch,) + frame.shape).copy()
        det = BatchedPyramidDetector(spec, frame.shape, batch,
                                     min_size=(40, 40), front_stages=10,
                                     cap=cap)
        det.detect(frames, min_neighbors=3)
        med, mn = dev_ms(det, frames)
        capp = cap + 6 * 64
        sub = batch
        while sub > 1 and sub * capp * 4 > bound:
            sub = -(-sub // 2)
        print(f"cap {cap:6d} bound {bound:7d} -> sub {sub} "
              f"({sub * capp * 4 / 1e3:.0f} KB table): {med:6.2f} ms/frame "
              f"(min {mn:.2f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"cap {cap} bound {bound}: FAILED {type(e).__name__}: {e}",
              flush=True)
    finally:
        os.environ.pop("CLFD_TAIL_SUB_WORDS", None)


def main():
    run(24576, 500_000)   # 1: sub 4 at the slow cap — mechanism test
    run(32768, 250_000)   # 2a: sub 2 at the bench cap
    run(32768, 125_000)   # 2b: sub 1
    run(32768, 900_000)   # control: the default (sub 4), re-measured


if __name__ == "__main__":
    main()
