#!/usr/bin/env python
"""Headline benchmark: 1080p frames/sec/chip, haarcascade_frontalface_alt,
full multi-scale detection (scaleFactor 1.1, minNeighbors 3, minSize 40x40).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N,
     "device_ms_per_frame": N, "mfu": N, "mfu_scalar_floor": N,
     "batch": N, "batch_table": {...}, "vga_table": {...},
     "tunnel": {...}}

Baseline (BASELINE.md north star): >= 2000 fps/chip.  The headline loop is
honest per-frame work: host->device transfer of the uint8 frame batch, the
whole compiled multi-scale program, device->host readback of the padded
survivor buffers, and host-side grouping of the candidates.

Noise design (round-5, VERDICT r4 items 1-2): the axon tunnel's H2D
bandwidth swings 22 MB/s - 1.7 GB/s between sessions (docs/PERF.md
host-phase table), so raw e2e argmax selects tunnel luck.  This bench
(a) measures the tunnel weather (H2D bandwidth, sync RTT) and reports
it in the JSON, (b) anchors config SELECTION to the stable signal:
among configs within 2% of the best device time, the best MEASURED
e2e wins (the host model max(device, h2d) + rtt/batch is reported per
config for diagnosis but never overrides measurement — the weather
probe is itself one noisy draw), and (c) reports the selected config's
measured best-of-N-passes e2e as the headline, with the per-config
median alongside in ``batch_table``.
``device_ms_per_frame`` isolates the compiled program (frames device-
resident, enqueue-N with one tiny readback — docs/PERF.md measurement
rules).  ``mfu`` uses the schedule-dependent useful-FLOP count;
``mfu_scalar_floor`` uses the schedule-INDEPENDENT scalar early-exit
floor measured on this exact scene (utils/flops.py::scalar_floor_flops,
docs/CEILING.md section 4) and is the cross-round-comparable figure.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 2000.0


def _probe_once(timeout_s: float) -> bool:
    """One child-process jax reachability probe.  A child, not in-process:
    when the axon tunnel is down, jax.devices() hangs rather than raising,
    and only a child is killable on timeout."""
    import subprocess
    code = ("import jax, numpy as np, jax.numpy as jnp; "
            "print(np.asarray(jnp.arange(4) * 2))")
    try:
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True,
                              timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _device_reachable():
    """Retry the probe with backoff before concluding 'unreachable'.

    Round 3 recorded a false 0.0 fps because ONE 180 s probe timed out
    under concurrent CPU load while the tunnel was actually up
    (BENCH_r03.json vs the 19.3 fps measured minutes later).  A single
    load-sensitive child timeout must never zero the headline: probe up
    to 3 times over ~10 minutes, with growing timeouts, and report the
    host load so 'device down' and 'host busy' are distinguishable."""
    attempts = max(1, int(os.environ.get("CLFD_BENCH_PROBE_ATTEMPTS", "3")))
    timeouts = (120.0, 180.0, 300.0)
    for i in range(attempts):
        if _probe_once(timeouts[min(i, len(timeouts) - 1)]):
            return True, ""
        if i + 1 < attempts:
            time.sleep(30.0 * (i + 1))
    load = os.getloadavg()[0] if hasattr(os, "getloadavg") else -1.0
    return False, (f"tpu_probe_failed_{attempts}_attempts"
                   f"(loadavg={load:.1f})")


def _weather(jax, jnp, frame_bytes: int):
    """Measure the tunnel right now: sync RTT and H2D bandwidth."""
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, 8 * frame_bytes, np.uint8)
    jax.block_until_ready(jnp.asarray(buf))        # warm path
    one = jnp.zeros((8, 128), jnp.float32)
    f_id = jax.jit(lambda x: x + 1.0)
    f_id(one).block_until_ready()
    rtts, h2ds = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f_id(one))
        rtts.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(buf))
        h2ds.append((time.perf_counter() - t0) * 1e3)
    h2d = statistics.median(h2ds)
    return dict(rtt_ms=round(statistics.median(rtts), 2),
                h2d_mbps=round(buf.nbytes / 1e6 / h2d * 1e3, 1),
                h2d_ms_per_frame=round(h2d / 8, 2))


def _device_ms(det, frames, reps) -> float:
    """Device-only ms/frame: frames resident, enqueue reps, one readback."""
    dev_frames = det.put(frames)
    out = det.run_device(dev_frames)
    np.asarray(out["packed"][:, :2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = det.run_device(dev_frames)
    np.asarray(out["packed"][:, :2])
    return ((time.perf_counter() - t0) / (reps * len(frames))) * 1e3


def _sweep_lists():
    """(fronts, caps, capbs, batches) from env, validated 1:1.

    The default triples: the round-4 saddle winner (front 10 /
    cap 32768), its round-5 tight-cap refinement (cap 20480 with
    compaction capb pinned at 8192 — the bench scene holds 8054 alive
    128-blocks, so the cap//4 default would under-provision and
    silently 4x-regrow; docs/PERF.md round-5 tail section), and the
    low-survivor alternative (front 12 / cap 16384).  capb 0 = default.
    """
    fronts = [int(v) for v in
              os.environ.get("CLFD_BENCH_FRONT", "10,10,12").split(",")]
    caps = [int(v) for v in
            os.environ.get("CLFD_BENCH_CAP", "20480,32768,16384").split(",")]
    capbs = [int(v) for v in
             os.environ.get("CLFD_BENCH_CAPB", "8192,0,0").split(",")]
    if not (len(fronts) == len(caps) == len(capbs)):
        raise ValueError(f"CLFD_BENCH_FRONT ({len(fronts)} values), "
                         f"CLFD_BENCH_CAP ({len(caps)}) and "
                         f"CLFD_BENCH_CAPB ({len(capbs)}) must pair 1:1")
    batches = [int(v) for v in
               os.environ.get("CLFD_BENCH_BATCHES", "8,16").split(",")]
    return fronts, caps, capbs, batches


def _select(rows):
    """Pick the headline config: among rows whose device time is within
    2% of the best, the best MEASURED e2e wins.

    Round-5 lesson (this round's own sweep): device_ms is the stable
    signal (<0.2% run-to-run) while the pre-measured tunnel weather can
    itself be an outlier draw — one session's probe said 161 ms/frame
    H2D while the pipelined stream measured 44 ms e2e minutes later, so
    a weather-anchored model handed the headline to the wrong batch
    size.  The host model stays in ``batch_table`` for diagnosis but
    never overrides measurement.  Rows are
    (dev_ms, e2e_s, fps, batch, det, n_surv, front, cap)."""
    dev_best = min(r[0] for r in rows)
    return min((r for r in rows if r[0] <= dev_best * 1.02),
               key=lambda r: r[1])


def _vga_batch(name: str, vbatch: int) -> int:
    """Per-cascade VGA batch cap.  frontalface_default's full-depth VGA
    program needs 23.20 GB HBM at batch 16 (compile-time OOM vs the
    chip's 15.75 GB — measured round 5, compile-service log): its front
    stages carry ~2x the stump count of frontalface_alt's, so its dense
    node maps are proportionally larger.  Batch 8 fits with ~4 GB of
    headroom (measured).  Must be identical in _precompile and the
    timing loop so the timing process only ever cache-hits."""
    if name == "haarcascade_frontalface_default":
        return min(vbatch, 8)
    return vbatch


def _precompile() -> None:
    """Warm the persistent compile cache for every swept config, then
    exit.  Run in a THROWAWAY subprocess: a big remote-compile RPC
    degrades the issuing process's H2D bandwidth ~100x for the rest of
    its life (measured, docs/PERF.md round-5 'H2D collapse' note — a
    fresh child of a collapsed parent transfers at full speed), so the
    timing process must only ever hit the cache."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.runtime import BatchedPyramidDetector
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    frame = photo_scene((1080, 1920))
    fronts, caps, capbs, batches = _sweep_lists()
    for front, cap, capb in zip(fronts, caps, capbs):
        for batch in batches:
            try:
                frames = np.broadcast_to(
                    frame, (batch,) + frame.shape).copy()
                det = BatchedPyramidDetector(
                    spec, frame.shape, batch, min_size=(40, 40),
                    front_stages=front, cap=cap,
                    compact_capb=capb or None)
                det.detect(frames, min_neighbors=3)
                print(f"# precompiled f{front}c{cap}b{batch}",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"# precompile f{front}b{batch} failed: {e}",
                      file=sys.stderr)
    # scalar-floor all-stages-dense program (single-frame)
    try:
        from clfacedetection_tpu.detect.pyramid import PyramidDetector
        PyramidDetector(spec, frame.shape, min_size=(40, 40)) \
            .stage_entering_counts(frame)
        print("# precompiled scalar-floor program", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# precompile scalar floor failed: {e}", file=sys.stderr)
    # VGA demo configs
    vga = photo_scene((480, 640))
    vbatch = int(os.environ.get("CLFD_BENCH_VGA_BATCH", "16"))
    for name in ("haarcascade_frontalface_default",
                 "haarcascade_frontalface_alt"):
        vb = _vga_batch(name, vbatch)
        try:
            vdet = BatchedPyramidDetector(load_cascade(name), vga.shape,
                                          vb, min_size=(40, 40))
            vdet.detect(
                np.broadcast_to(vga, (vb,) + vga.shape).copy(),
                min_neighbors=3)
            print(f"# precompiled VGA {name} b{vb}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# precompile VGA {name} failed: {e}", file=sys.stderr)


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    if "--precompile" in sys.argv:
        _precompile()
        return
    ok, why = _device_reachable()
    if not ok:
        print(json.dumps({
            "metric": "1080p_frontalface_alt_detect_fps_per_chip",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": why,
        }))
        return
    # warm the persistent compile cache from a throwaway child FIRST:
    # any big compile RPC issued by THIS process would collapse its H2D
    # bandwidth ~100x for the rest of the run (measured; docs/PERF.md)
    if os.environ.get("CLFD_BENCH_PRECOMPILE", "1") != "0":
        import subprocess
        try:
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--precompile"],
                           timeout=float(os.environ.get(
                               "CLFD_BENCH_PRECOMPILE_TIMEOUT", "2400")),
                           stdout=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# precompile child failed/timed out ({e}); "
                  f"continuing with a possibly cold cache", file=sys.stderr)
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.runtime import BatchedPyramidDetector
    from clfacedetection_tpu.utils import photo_scene
    from clfacedetection_tpu.utils.flops import (PEAK_FLOPS_BF16,
                                                 pipeline_flops,
                                                 scalar_floor_flops)

    spec = load_cascade("haarcascade_frontalface_alt")
    # real photograph backdrop + pasted faces (utils/testimage.py): real
    # image statistics, unlike the procedural scenes whose texture is
    # unrealistically cascade-friendly (docs/PERF.md round-1 note)
    frame = photo_scene((1080, 1920))

    weather = _weather(jax, jnp, frame.nbytes)
    print(f"# tunnel weather: RTT {weather['rtt_ms']} ms, H2D "
          f"{weather['h2d_mbps']} MB/s = {weather['h2d_ms_per_frame']} "
          f"ms/frame", file=sys.stderr)

    # swept dimensions: batch size AND front/cap/capb triples
    # (_sweep_lists: the round-4 saddle winner, its round-5 tight-cap
    # refinement, and the low-survivor front-12 alternative)
    fronts, caps, capbs, batches = _sweep_lists()
    reps = max(1, int(os.environ.get("CLFD_BENCH_REPS", "10")))
    passes = max(1, int(os.environ.get("CLFD_BENCH_PASSES", "5")))

    rows = []
    table = {}
    for front, cap, capb in zip(fronts, caps, capbs):
     for batch in batches:
        # one failing config (OOM, tunnel hiccup mid-compile) must not
        # zero the headline: the remaining configs still score
        try:
            frames = np.broadcast_to(frame, (batch,) + frame.shape).copy()
            det = BatchedPyramidDetector(
                spec, frame.shape, batch, min_size=(40, 40),
                front_stages=front, cap=cap, compact_capb=capb or None)
            # warm-up: full path incl. potential cap regrowth
            res = det.detect(frames, min_neighbors=3)
            n_boxes = len(res[0].boxes)
            # device-only FIRST: it is the stable signal the selection
            # anchors to (<0.2% run-to-run in BENCH_r04's own table)
            dev_ms = _device_ms(det, frames, reps)
            n_surv = int(np.asarray(
                det.run_device(det.put(frames))["packed"][:, 0]).max())
            # e2e: timed passes of the threaded pipelined stream loop
            # (host->device, device program, readback, grouping)
            e2es = []
            for _ in range(passes):
                t0 = time.perf_counter()
                for res in det.detect_stream((frames for _ in range(reps)),
                                             min_neighbors=3, depth=3):
                    pass
                e2es.append((time.perf_counter() - t0) / (reps * batch))
            dt = min(e2es)
            e2e_med = statistics.median(e2es)
            fps = 1.0 / dt
            # the host model the selection anchors to: device time or
            # H2D weather, whichever binds, plus the per-batch sync RTT
            model_ms = (max(dev_ms, weather["h2d_ms_per_frame"])
                        + weather["rtt_ms"] / batch)
            table[f"f{front}c{cap // 1024}kb{batch}"] = {
                "e2e_ms_best": round(dt * 1e3, 2),
                "e2e_ms_median": round(e2e_med * 1e3, 2),
                "device_ms": round(dev_ms, 2),
                "model_ms": round(model_ms, 2),
                "n_surv": n_surv}
            print(f"# front={front} cap={cap} batch={batch}: e2e best "
                  f"{dt*1e3:.2f} median {e2e_med*1e3:.2f} ms/frame = "
                  f"{fps:.1f} fps, device {dev_ms:.2f}, model "
                  f"{model_ms:.2f} ({n_boxes} faces, {n_surv} survivors)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# front={front} cap={cap} batch={batch}: FAILED "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            continue
        rows.append((dev_ms, dt, fps, batch, det, n_surv, front, cap))

    if not rows:
        print(json.dumps({
            "metric": "1080p_frontalface_alt_detect_fps_per_chip",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": "all_batch_configs_failed", "batch_table": table,
            "tunnel": weather,
        }))
        return

    dev_ms, dt, fps, batch, det, n_surv, front, cap = _select(rows)
    fl = pipeline_flops(det.det, n_surv)
    mfu = fl["useful_flops"] / (dev_ms * 1e-3) / PEAK_FLOPS_BF16
    # schedule-independent scalar-early-exit floor, measured on this
    # exact scene (one extra all-stages-dense program; compile-cached)
    out = {}
    try:
        ent = det.det.stage_entering_counts(frame)
        sf = scalar_floor_flops(det.det, ent)
        out["scalar_floor_gflops_per_frame"] = round(
            sf["scalar_floor_flops"] / 1e9, 4)
        out["scalar_node_evals_m"] = round(sf["scalar_node_evals"] / 1e6, 2)
        out["mfu_scalar_floor"] = round(
            sf["scalar_floor_flops"] / (dev_ms * 1e-3) / PEAK_FLOPS_BF16, 8)
    except Exception as e:  # noqa: BLE001
        print(f"# scalar floor failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # the reference's own demo workload: 640x480, pyramid mode, both
    # frontalface cascades (main.cpp:28-31,72-97) — recorded so the
    # VGA headline is a committed artifact (VERDICT r4 item 6)
    vga_table = {}
    vga = photo_scene((480, 640))
    vbatch = int(os.environ.get("CLFD_BENCH_VGA_BATCH", "16"))
    for name in ("haarcascade_frontalface_default",
                 "haarcascade_frontalface_alt"):
        key = name.replace("haarcascade_frontalface_", "")
        vb = _vga_batch(name, vbatch)
        try:
            vspec = load_cascade(name)
            vframes = np.broadcast_to(vga, (vb,) + vga.shape).copy()
            vdet = BatchedPyramidDetector(vspec, vga.shape, vb,
                                          min_size=(40, 40))
            vdet.detect(vframes, min_neighbors=3)
            vdev = _device_ms(vdet, vframes, reps)
            ve2es = []
            for _ in range(max(2, passes - 2)):
                t0 = time.perf_counter()
                for _ in vdet.detect_stream(
                        (vframes for _ in range(reps)),
                        min_neighbors=3, depth=3):
                    pass
                ve2es.append((time.perf_counter() - t0) / (reps * vb))
            vga_table[key] = {
                "e2e_ms_best": round(min(ve2es) * 1e3, 2),
                "e2e_fps": round(1.0 / min(ve2es), 1),
                "device_ms": round(vdev, 2),
                "device_fps": round(1e3 / vdev, 1),
                "batch": vb}
            print(f"# VGA {key} (batch {vb}): e2e {min(ve2es)*1e3:.2f} "
                  f"ms/frame = {1/min(ve2es):.1f} fps, device {vdev:.2f} ms",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# VGA {key} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "1080p_frontalface_alt_detect_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "batch": batch,
        "front_stages": front,
        "cap": det.det.cap,
        "compact_capb": det.det.compact_capb,
        "e2e_ms_per_frame": round(1e3 / fps, 2),
        "device_ms_per_frame": round(dev_ms, 2),
        "useful_gflops_per_frame": round(fl["useful_flops"] / 1e9, 3),
        "mfu": round(mfu, 6),
        **out,
        "batch_table": table,
        "vga_table": vga_table,
        "tunnel": weather,
    }))


if __name__ == "__main__":
    main()
