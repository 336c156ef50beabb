#!/usr/bin/env python
"""Row-strip sharded pipeline timing on the real chip (1-strip mesh).

With one physical chip the strip program must be within noise of the
unsharded pipeline (same work, one extra visit operand + reshape); on a
real k-chip pod the front phase would split k ways.  Records compile
time and steady-state ms/frame for PARITY/PERF notes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.parallel import StripShardedPyramidDetector
    from clfacedetection_tpu.utils import photo_scene

    print("devices:", jax.devices(), flush=True)
    spec = load_cascade("haarcascade_frontalface_alt")
    frame = photo_scene((1080, 1920))
    gray = (np.round(0.114 * frame[..., 0].astype(np.float64)
                     + 0.587 * frame[..., 1] + 0.299 * frame[..., 2])
            .astype(np.uint8) if frame.ndim == 3 else frame)
    fk = int(os.environ.get("CLFD_PROF_FRONT", "12"))
    cap = int(os.environ.get("CLFD_PROF_CAP", "16384"))
    det = PyramidDetector(spec, gray.shape, min_size=(40, 40),
                          front_stages=fk, cap=cap)
    t0 = time.perf_counter()
    ref, _ = det.candidates(gray)
    print(f"unsharded warm+compile {time.perf_counter()-t0:.1f}s, "
          f"{len(ref)} candidates", flush=True)
    reps = int(os.environ.get("CLFD_PROF_REPS", "10"))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            det.candidates(gray)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"unsharded: {best*1e3:.1f} ms/frame", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), ("strips",))
    sdet = StripShardedPyramidDetector(det, mesh)
    t0 = time.perf_counter()
    got, _ = sdet.candidates(gray)
    print(f"strips(1) warm+compile {time.perf_counter()-t0:.1f}s, "
          f"match={np.array_equal(got, ref)}", flush=True)
    best_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            sdet.candidates(gray)
        best_s = min(best_s, (time.perf_counter() - t0) / reps)
    print(f"strips(1): {best_s*1e3:.1f} ms/frame "
          f"({best_s/best:.2f}x unsharded)", flush=True)


if __name__ == "__main__":
    main()
