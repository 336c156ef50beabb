#!/usr/bin/env python
"""H2D transfer experiments through the axon tunnel (round-5 VERDICT #1).

prof_host.py measured the e2e bottleneck: a [8,1080,1920] uint8 batch
(16.6 MB) takes ~750 ms to put = 22 MB/s, with a ~31 ms tunnel RTT.
22 MB/s x 31 ms = ~680 KB in flight -- the classic single-stream
bandwidth-delay-product wall.  This script tests whether concurrency
beats it:

  A  one blocked put of the full batch            (baseline)
  B  B async per-frame puts, then block all       (async pipelining)
  C  N threads x batch/N-frame chunked puts       (parallel streams)
  D  per-put overhead at small sizes              (latency floor)

Run on an otherwise-idle host (PERF.md measurement rules).
"""

import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def med_ms(fn, n=5):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(xs), min(xs)


def main():
    batch = int(os.environ.get("CLFD_PROF_BATCH", "8"))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, 1080, 1920), np.uint8)
    mb = frames.nbytes / 1e6
    dev = jax.devices()[0]

    # warm
    jax.block_until_ready(jnp.asarray(frames))

    # A: one blocked put
    a, a_min = med_ms(lambda: jax.block_until_ready(jnp.asarray(frames)))
    print(f"A one-put      {mb:5.1f} MB  {a:7.1f} ms  {mb/a*1e3:6.1f} MB/s"
          f"  (min {a_min:.1f})")

    # B: async per-frame puts, block all at the end
    def b_fn():
        arrs = [jnp.asarray(frames[i]) for i in range(batch)]
        for x in arrs:
            jax.block_until_ready(x)
    b, b_min = med_ms(b_fn)
    print(f"B async x{batch}    {mb:5.1f} MB  {b:7.1f} ms  {mb/b*1e3:6.1f} MB/s"
          f"  (min {b_min:.1f})")

    # C: N threads, each device_put-ing a contiguous chunk
    for n_threads in (2, 4, 8):
        if batch % n_threads:
            continue
        chunks = np.split(frames, n_threads)

        def c_fn():
            with ThreadPoolExecutor(n_threads) as ex:
                futs = [ex.submit(
                    lambda c=c: jax.block_until_ready(jnp.asarray(c)))
                    for c in chunks]
                for f in futs:
                    f.result()
        c, c_min = med_ms(c_fn)
        print(f"C {n_threads} threads   {mb:5.1f} MB  {c:7.1f} ms  "
              f"{mb/c*1e3:6.1f} MB/s  (min {c_min:.1f})")

    # D: per-put latency floor at small sizes
    for kb in (1, 64, 512, 2048):
        buf = frames.reshape(-1)[:kb * 1024].copy()
        d, _ = med_ms(lambda: jax.block_until_ready(jnp.asarray(buf)), n=10)
        print(f"D put {kb:5d} KB                {d:7.1f} ms  "
              f"{buf.nbytes/1e6/d*1e3:6.1f} MB/s")


if __name__ == "__main__":
    main()
