#!/usr/bin/env python
"""Per-phase host-path profiling for the bench e2e loop (VERDICT r4 #1).

The round-4 artifact recorded e2e 64.09 ms/frame vs device 38.58 at the
winning config — ~25 ms/frame of host time with no committed evidence of
where it goes.  This script times every phase of the exact bench loop
(BatchedPyramidDetector at the bench config) on the real TPU:

  put        jnp.asarray + (block) of the [B,1080,1920] uint8 batch  (H2D)
  dispatch   run_device() call returning async arrays                (enqueue)
  sync       np.asarray(dev["packed"]) — blocks on compute + D2H
  finish     host-side boxes_for + group_rectangles

plus raw tunnel microbenchmarks (H2D/D2H bandwidth, null-dispatch
latency, block_until_ready on a trivial op) so the phase numbers can be
cross-checked against a cost model.  Prints a phase table; run on an
otherwise-idle host (PERF.md measurement rules).
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.runtime import BatchedPyramidDetector
from clfacedetection_tpu.utils import photo_scene


def t_ms(fn, n=5):
    """Median wall ms over n calls."""
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(xs), min(xs), max(xs)


def main():
    batch = int(os.environ.get("CLFD_PROF_BATCH", "8"))
    front = int(os.environ.get("CLFD_PROF_FRONT", "10"))
    cap = int(os.environ.get("CLFD_PROF_CAP", "32768"))
    reps = int(os.environ.get("CLFD_PROF_REPS", "10"))

    spec = load_cascade("haarcascade_frontalface_alt")
    frame = photo_scene((1080, 1920))
    frames = np.broadcast_to(frame, (batch,) + frame.shape).copy()

    print(f"# config: batch={batch} front={front} cap={cap}", file=sys.stderr)

    # ---- raw tunnel microbenchmarks -------------------------------------
    dev = jax.devices()[0]
    # null dispatch + tiny sync
    one = jnp.zeros((8, 128), jnp.float32)
    f_id = jax.jit(lambda x: x + 1.0)
    f_id(one).block_until_ready()
    null_disp, *_ = t_ms(lambda: f_id(one), n=20)
    tiny_sync, *_ = t_ms(lambda: np.asarray(f_id(one)), n=10)
    # H2D: the actual frame batch (16.6 MB at b8)
    h2d_put, h2d_min, h2d_max = t_ms(
        lambda: jax.block_until_ready(jnp.asarray(frames)), n=5)
    mb = frames.nbytes / 1e6
    # D2H: a packed-readback-sized buffer (B x 8194 int32 ≈ 262 KB at b8)
    pk = jnp.zeros((batch, 2 + 2 * 4096), jnp.int32) + 1
    pk = jax.block_until_ready(pk)
    d2h_pk, *_ = t_ms(lambda: np.asarray(pk), n=10)
    print(f"# tunnel: null_dispatch {null_disp:.2f} ms, tiny_sync "
          f"{tiny_sync:.2f} ms", file=sys.stderr)
    print(f"# tunnel: H2D {mb:.1f} MB in {h2d_put:.1f} ms "
          f"(min {h2d_min:.1f}, max {h2d_max:.1f}) = "
          f"{mb / h2d_put * 1e3:.1f} MB/s", file=sys.stderr)
    print(f"# tunnel: D2H packed ({pk.nbytes / 1e3:.0f} KB) "
          f"{d2h_pk:.1f} ms", file=sys.stderr)

    # ---- build detector, warm up ----------------------------------------
    det = BatchedPyramidDetector(spec, frame.shape, batch,
                                 min_size=(40, 40),
                                 front_stages=front, cap=cap)
    res = det.detect(frames, min_neighbors=3)
    print(f"# warm: {len(res[0].boxes)} boxes", file=sys.stderr)

    # ---- per-phase timing of one serial iteration ------------------------
    phases = {k: [] for k in ("put", "dispatch", "sync", "finish")}
    for _ in range(reps):
        t0 = time.perf_counter()
        dv = det.put(frames)
        jax.block_until_ready(dv)
        t1 = time.perf_counter()
        out = det.run_device(dv)
        t2 = time.perf_counter()
        packed, n_surv = det._read_counts(out)
        t3 = time.perf_counter()
        det._finish(batch, out, packed, n_surv, 3, det.det.cap)
        t4 = time.perf_counter()
        phases["put"].append((t1 - t0) * 1e3)
        phases["dispatch"].append((t2 - t1) * 1e3)
        phases["sync"].append((t3 - t2) * 1e3)
        phases["finish"].append((t4 - t3) * 1e3)
    table = {}
    print(f"# --- serial per-batch phases (ms, median/min/max over {reps}; "
          f"/{batch} for per-frame) ---", file=sys.stderr)
    for k, xs in phases.items():
        table[k] = dict(median=round(statistics.median(xs), 1),
                        min=round(min(xs), 1), max=round(max(xs), 1),
                        per_frame=round(statistics.median(xs) / batch, 2))
        print(f"#   {k:9s} {table[k]['median']:8.1f} "
              f"[{table[k]['min']:.1f}, {table[k]['max']:.1f}]  "
              f"-> {table[k]['per_frame']:.2f} ms/frame", file=sys.stderr)

    # ---- async put (no block): what the stream loop actually pays -------
    async_put, *_ = t_ms(lambda: det.put(frames), n=10)
    print(f"# put without block: {async_put:.1f} ms "
          f"(dispatch-side cost only)", file=sys.stderr)

    # ---- the pipelined stream loop, instrumented -------------------------
    for depth in (2, 3, 4):
        n_batches = reps
        t0 = time.perf_counter()
        for _ in det.detect_stream((frames for _ in range(n_batches)),
                                   min_neighbors=3, depth=depth):
            pass
        dt = (time.perf_counter() - t0) / (n_batches * batch) * 1e3
        print(f"# stream depth={depth}: {dt:.2f} ms/frame = "
              f"{1e3 / dt:.1f} fps", file=sys.stderr)
        table[f"stream_d{depth}_ms_per_frame"] = round(dt, 2)

    # ---- device-only for reference ---------------------------------------
    dv = det.put(frames)
    out = det.run_device(dv)
    np.asarray(out["packed"][:, :2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = det.run_device(dv)
    np.asarray(out["packed"][:, :2])
    dev_ms = (time.perf_counter() - t0) / (reps * batch) * 1e3
    print(f"# device-only: {dev_ms:.2f} ms/frame", file=sys.stderr)
    table["device_ms_per_frame"] = round(dev_ms, 2)
    table["tunnel"] = dict(null_dispatch_ms=round(null_disp, 2),
                           tiny_sync_ms=round(tiny_sync, 2),
                           h2d_ms=round(h2d_put, 1),
                           h2d_mb=round(mb, 1),
                           h2d_mbps=round(mb / h2d_put * 1e3, 1),
                           d2h_packed_ms=round(d2h_pk, 1),
                           d2h_packed_kb=round(pk.nbytes / 1e3))
    print(json.dumps(table))


if __name__ == "__main__":
    main()
