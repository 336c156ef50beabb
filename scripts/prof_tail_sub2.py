#!/usr/bin/env python
"""Round-5 dead-step isolation, take 2 (follow-up to prof_tail_r5.py).

prof_tail_r5's cap sweep never tested dead steps: at cap<=24576 the
compaction capb (cap//4) under-provisions the ~7-8k alive blocks, the
overflow silently 4x-regrows the cap, and the 'cap 24576' row actually
measured a cap-98304 program (confirmed: post-warmup det.cap = 98304 /
81920).  With CLFD_COMPACT_CAPB pinned at 8192 (the value that works at
cap 32768), a tighter cap now genuinely shrinks the provisioned chunk
grid (dead steps) and the slot tables:

  cap 32768 -> 518 provisioned chunks, ~227 dead  (control, 38.6 ms)
  cap 20480 -> 326 provisioned chunks, ~35 dead   (predicted ~37.5 ms
               if the ~5 us/dead-step model holds)

Also prints the measured alive-block count (capb headroom) and tries
the combined best config (tight cap + sub-1 launches).

Run on an otherwise-idle host (PERF.md measurement rules).
"""

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

SPEC = load_cascade("haarcascade_frontalface_alt")
FRAME = photo_scene((1080, 1920))


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


def run(cap, capb=None, sub_words=None, batch=8, label=""):
    if capb is not None:
        os.environ["CLFD_COMPACT_CAPB"] = str(capb)
    if sub_words is not None:
        os.environ["CLFD_TAIL_SUB_WORDS"] = str(sub_words)
    try:
        frames = np.broadcast_to(FRAME, (batch,) + FRAME.shape).copy()
        det = BatchedPyramidDetector(SPEC, FRAME.shape, batch,
                                     min_size=(40, 40), front_stages=10,
                                     cap=cap)
        det.detect(frames, min_neighbors=3)
        if det.det.cap != cap:
            print(f"{label}: cap REGREW {cap} -> {det.det.cap}; "
                  f"capb still too small", flush=True)
            return
        med, mn = dev_ms(det, frames)
        print(f"{label}: cap {cap} capb {capb or 'dflt'} "
              f"sub_words {sub_words or 'dflt'}: {med:6.2f} ms/frame "
              f"(min {mn:.2f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        os.environ.pop("CLFD_COMPACT_CAPB", None)
        os.environ.pop("CLFD_TAIL_SUB_WORDS", None)


def alive_blocks(batch=8):
    """Measured alive-block count at the bench config (capb headroom)."""
    frames = np.broadcast_to(FRAME, (batch,) + FRAME.shape).copy()
    det = BatchedPyramidDetector(SPEC, FRAME.shape, batch,
                                 min_size=(40, 40), front_stages=10,
                                 cap=32768)
    det.detect(frames, min_neighbors=3)
    pdet = det.det

    def count(g):
        f = pdet._front_device_batch(g)
        flat = f["front"][0]
        npad = -(-flat.shape[0] // 128) * 128
        flat = jnp.concatenate([flat,
                                jnp.zeros((npad - flat.shape[0],), bool)])
        return jnp.sum(jnp.any(flat.reshape(-1, 128), axis=1))

    n = int(np.asarray(jax.jit(count)(det.put(frames))))
    print(f"# alive 128-blocks at bench config: {n} "
          f"(capb at cap 32768 = 8192)", flush=True)


def main():
    alive_blocks()
    run(20480, capb=8192, label="1 tight cap, pinned capb")
    run(20480, capb=8192, sub_words=250_000, label="2 + sub-1 launches")
    run(32768, label="3 control (default)")


if __name__ == "__main__":
    main()
