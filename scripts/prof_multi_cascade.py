#!/usr/bin/env python
"""BASELINE config 5 timing: profileface + upperbody + fullbody over
1080p frame batches (the reference would loop cvHaarDetectObjects once
per cascade per frame, main.cpp:72-97).

Times the fused MultiCascadeBatchedDetector step (one dispatch + one
packed readback for all K cascades) against K independent
BatchedPyramidDetector runs, steady-state on the real chip.

Usage: [CLFD_PROF_BATCH=8] [CLFD_PROF_REPS=5] python scripts/prof_multi_cascade.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

NAMES = ["haarcascade_profileface", "haarcascade_upperbody",
         "haarcascade_fullbody"]


def main():
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.runtime import (BatchedPyramidDetector,
                                             MultiCascadeBatchedDetector)
    from clfacedetection_tpu.utils import photo_scene

    print("devices:", jax.devices(), flush=True)
    shape = (1080, 1920)
    batch = int(os.environ.get("CLFD_PROF_BATCH", "8"))
    reps = int(os.environ.get("CLFD_PROF_REPS", "5"))
    frame = photo_scene(shape)
    gray = (np.round(0.114 * frame[..., 0].astype(np.float64)
                     + 0.587 * frame[..., 1] + 0.299 * frame[..., 2])
            .astype(np.uint8) if frame.ndim == 3 else frame)
    frames = np.broadcast_to(gray, (batch,) + shape).copy()
    specs = [load_cascade(n) for n in NAMES]

    def steady(fn):
        fn()                                   # compile + warmup (+ regrow)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best = min(best, (time.perf_counter() - t0) / reps / batch)
        return best * 1e3

    multi = MultiCascadeBatchedDetector(specs, shape, batch,
                                        min_size=(40, 40))
    ms_fused = steady(lambda: multi.detect(frames, min_neighbors=3))
    print(f"fused {len(specs)}-cascade batch={batch}: "
          f"{ms_fused:.1f} ms/frame ({1e3 / ms_fused:.1f} fps)", flush=True)

    singles = [BatchedPyramidDetector(s, shape, batch, min_size=(40, 40))
               for s in specs]

    def run_separate():
        for d in singles:
            d.detect(frames, min_neighbors=3)

    ms_sep = steady(run_separate)
    print(f"separate x{len(specs)} batch={batch}: "
          f"{ms_sep:.1f} ms/frame ({1e3 / ms_sep:.1f} fps) "
          f"-> fused speedup {ms_sep / ms_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
