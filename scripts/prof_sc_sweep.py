#!/usr/bin/env python
"""Scale-cascade front-depth sweep (round 4).

Hypothesis: the mode's measured 40 s/frame at VGA is gather-tail bound
(XLA gathers at ~0.27 G elem/s over front-3 survivors), while the dense
per-scale front maps are slice-bound and comparatively cheap — so
deepening the front (up to all stages, which removes the gather tail
entirely) should win big.  Sweeps front_stages and reports steady-state
ms/frame + survivor counts.

Usage: CLFD_SC_FKS=3,8,12,22 CLFD_SC_SHAPES=480x640 python scripts/prof_sc_sweep.py
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
    spec = load_cascade(os.environ.get("CLFD_SC_CASCADE",
                                       "haarcascade_frontalface_alt"))
    shapes = [tuple(int(v) for v in s.split("x"))
              for s in os.environ.get("CLFD_SC_SHAPES", "480x640").split(",")]
    fks = [int(v) for v in os.environ.get("CLFD_SC_FKS",
                                          "3,8,12,22").split(",")]
    reps = int(os.environ.get("CLFD_SC_REPS", "1"))
    for shape in shapes:
        frame = photo_scene(shape)
        gray = (np.round(0.114 * frame[..., 0].astype(np.float64)
                         + 0.587 * frame[..., 1] + 0.299 * frame[..., 2])
                .astype(np.uint8) if frame.ndim == 3 else frame)
        base = None
        for fk in fks:
            det = ScaleCascadeDetector(spec, shape, min_size=(40, 40),
                                       front_stages=fk)
            t0 = time.perf_counter()
            cand, ovf = det.candidates(gray)
            warm = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(reps):
                    cand2, ovf2 = det.candidates(gray)
                best = min(best, (time.perf_counter() - t0) / reps)
            if base is None:
                base = set(map(tuple, np.asarray(cand).tolist()))
            got = set(map(tuple, np.asarray(cand2).tolist()))
            eq = "==" if got == base else "!= BASE (PARITY BUG)"
            print(f"{shape[0]}x{shape[1]} fk={fk:2d}: {best*1e3:9.1f} "
                  f"ms/frame ({det.n_scales} scales, cap {det.cap}, "
                  f"{len(cand2)} cands {eq}, ovf={ovf2}, warm {warm:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
