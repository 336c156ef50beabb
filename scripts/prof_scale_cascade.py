#!/usr/bin/env python
"""Scale-cascade mode steady-state timing (docs/PERF.md table source).

The reference demo's own mode (clodDetectObjectsOpenCL,
clod.cpp:1176-1338): the cascade's feature geometry is rescaled per
scale and the *original* integral image is scanned.  Times
ScaleCascadeDetector.candidates() — per-scale shared-program
dispatches + the single packed readback — end to end on the real chip.

Usage: CLFD_PROF_SHAPES=480x640,1080x1920 python scripts/prof_scale_cascade.py
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


def main():
    from clfacedetection_tpu.detect import ScaleCascadeDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    print("devices:", jax.devices(), flush=True)
    cascade = os.environ.get("CLFD_PROF_CASCADE",
                             "haarcascade_frontalface_alt")
    spec = load_cascade(cascade)
    shapes = [tuple(int(v) for v in s.split("x"))
              for s in os.environ.get("CLFD_PROF_SHAPES",
                                      "480x640,1080x1920").split(",")]
    reps = int(os.environ.get("CLFD_PROF_REPS", "5"))
    for shape in shapes:
        frame = photo_scene(shape)
        gray = (np.round(0.114 * frame[..., 0].astype(np.float64)
                         + 0.587 * frame[..., 1] + 0.299 * frame[..., 2])
                .astype(np.uint8) if frame.ndim == 3 else frame)
        det = ScaleCascadeDetector(spec, shape, min_size=(40, 40))
        t0 = time.perf_counter()
        cand, ovf = det.candidates(gray)   # compile + warmup (+ regrow)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                cand, ovf = det.candidates(gray)
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{cascade} {shape[0]}x{shape[1]}: {best*1e3:.1f} ms/frame "
              f"steady-state ({det.n_scales} scales, {len(cand)} candidates,"
              f" overflow={ovf}, warmup+compile {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
