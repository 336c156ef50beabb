#!/usr/bin/env python
"""Round-3 phase profile: front-depth sweep on the bench scene.

Measures, per front_stages setting on the real chip:
  prep (canvas+integral+pads), front kernel, compact, tail, fused
  pipeline, and the survivor count — using the enqueue-N / read-one-tiny
  -output method (docs/PERF.md measurement rules: block_until_ready lies
  through the tunnel; every np.asarray costs ~24 ms sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def time_tiny(fn, *args, iters=20, warmup=2):
    """ms/call: enqueue iters, read ONE tiny output at the end."""
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from clfacedetection_tpu.detect.pyramid import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    frame = photo_scene((1080, 1920))
    gray_np = np.asarray(
        np.round(0.114 * frame[..., 0].astype(np.float64)
                 + 0.587 * frame[..., 1] + 0.299 * frame[..., 2])
    ).astype(np.uint8) if frame.ndim == 3 else frame
    print("devices:", jax.devices(), flush=True)

    fks = [int(v) for v in os.environ.get("CLFD_PROF_FKS",
                                          "2,4,6,8,12").split(",")]
    cap = int(os.environ.get("CLFD_PROF_CAP", "0"))
    for fk in fks:
        det = PyramidDetector(spec, gray_np.shape, min_size=(40, 40),
                              front_stages=fk,
                              cap=cap or None)
        gray = jnp.asarray(gray_np, jnp.uint8)

        def prep_only(g):
            planes, hi, lo = det._prep_planes(g)
            return planes["sum"][-1, -1] + hi[-1, -1] + lo[-1, -1]

        def front_only(g):
            f = det._front_device(g)
            return (f["front"].sum().astype(jnp.int32)
                    + f["planes"]["sum"][-1, -1])

        def front_compact(g):
            f = det._front_device(g)
            return det._compact_device(f["front"])[1]

        def full(g):
            out = det._detect_device(g)
            return out["packed"][:2] if "packed" in out else out["n_surv"]

        t_prep = time_tiny(jax.jit(prep_only), gray)
        t_front = time_tiny(jax.jit(front_only), gray)
        t_fc = time_tiny(jax.jit(front_compact), gray)
        jfull = jax.jit(full)
        n_surv = int(np.asarray(jfull(gray)).ravel()[0])
        t_full = time_tiny(jfull, gray)
        print(f"fk={fk:2d} cap={det.cap:6d} n_surv={n_surv:7d} "
              f"tail2={det.use_pallas_tail2} | prep {t_prep:6.2f} "
              f"front(+prep) {t_front:6.2f} +compact {t_fc:6.2f} "
              f"full {t_full:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
