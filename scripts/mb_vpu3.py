#!/usr/bin/env python
"""Round-3 roofline microbenchmarks, take 3.

Lessons baked in: (a) every D2H read costs ~24-28 ms -> read ONE tiny
output after enqueueing all iterations; (b) each dispatch costs ~3-5 ms
through the tunnel -> amplify compute with an in-kernel fori_loop so the
op under test dominates; (c) pure affine chains constant-fold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GH, GW = 2272, 1280
BH, BW = 32, 256
NEL = GH * GW


def time_last(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1e3


def chain_call(trip_body, trips, in_w=BW + 128):
    """Kernel: fori_loop(trips) over a 32-op unrolled body."""
    def kern(x_ref, o_ref):
        def body(t, acc):
            return trip_body(x_ref, acc, t)
        o_ref[...] = jax.lax.fori_loop(0, trips, body, x_ref[:, 0:BW])

    return pl.pallas_call(
        kern,
        grid=(GH // BH, GW // BW),
        in_specs=[pl.BlockSpec((BH, in_w), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GH, GW), jnp.float32),
    )


def bench(name, trip_body, ops_per_trip, in_w=BW + 128, trips=(4, 16)):
    xs = jax.device_put(np.random.rand(GH, in_w).astype(np.float32))
    times = {}
    for tr in trips:
        call = chain_call(trip_body, tr, in_w)
        fn = jax.jit(lambda x, call=call: call(x)[::37, ::37].sum())
        times[tr] = round(time_last(fn, xs, iters=8), 3)
    t0, t1 = trips[0], trips[-1]
    slope = (times[t1] - times[t0]) / ((t1 - t0) * ops_per_trip)
    ps = slope * 1e9 / NEL
    print(f"{name:26s}: {times} -> {ps:6.2f} ps/elem/op"
          f"  ({NEL/max(slope,1e-9)*1e3/1e12:.2f} Top/s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    # dispatch overhead: trivial kernel
    call = chain_call(lambda x_ref, acc, t: acc, 1)
    fn = jax.jit(lambda x, call=call: call(x)[::37, ::37].sum())
    xs = jax.device_put(np.random.rand(GH, BW + 128).astype(np.float32))
    print(f"{'empty sweep (dispatch)':26s}: {time_last(fn, xs, iters=8):.3f}"
          " ms/call", flush=True)

    # 32 slice+adds per trip, offsets vary with t via 4 static variants
    def slices_trip(x_ref, acc, t):
        for i in range(32):
            c = (i * 7 + 3) % 100
            acc = acc + x_ref[:, c:c + BW]
        return acc * np.float32(0.5)
    bench("lane-slice+add", slices_trip, 33)

    def arith_trip(x_ref, acc, t):
        x0 = x_ref[:, 7:7 + BW]
        for i in range(16):
            acc = jnp.maximum(acc * np.float32(0.9999),
                              x0 * (t.astype(jnp.float32)
                                    + np.float32(i)))
        return acc
    bench("mul+max+mul (3ops)", arith_trip, 48)

    def cmpsel_trip(x_ref, acc, t):
        x0 = x_ref[:, 3:3 + BW]
        for i in range(16):
            c = acc < x0 * np.float32(0.5 + i * 0.01)
            acc = acc + jnp.where(c, np.float32(0.25), np.float32(-0.25))
        return acc
    bench("mul+cmp+sel+add (4ops)", cmpsel_trip, 64)

    # rect-style: 2 slices + sub + fma accumulate (5 ops)
    def rect_trip(x_ref, acc, t):
        for i in range(16):
            c = (i * 7 + 3) % 50
            d = (i * 11 + 17) % 50
            acc = acc + (x_ref[:, c:c + BW]
                         - x_ref[:, d:d + BW]) * np.float32(0.01)
        return acc
    bench("2slice+sub+mul+add (5op)", rect_trip, 80)

    import ml_dtypes
    a = jax.device_put((np.random.rand(2048, 768) * 0.01)
                       .astype(ml_dtypes.bfloat16))
    b = jax.device_put((np.random.rand(768, 2048) * 0.01)
                       .astype(ml_dtypes.bfloat16))

    def mmb(a, b):
        def it(i, acc):
            return (jnp.dot(a, b, preferred_element_type=jnp.float32)
                    [0:768, 0:768] * np.float32(1e-3)).astype(jnp.bfloat16)
        out = jax.lax.fori_loop(0, 16, it, a[0:768, 0:768])
        return out.astype(jnp.float32).sum()
    ms = time_last(jax.jit(mmb), a, b, iters=8)
    fl = 2 * 2048 * 768 * 2048 * 16
    print(f"{'MXU bf16':26s}: {ms:.2f} ms/16mm = {fl/ms/1e9:.1f} TFLOP/s",
          flush=True)

    # front kernel sweep (the number that matters)
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.detect.pyramid import PyramidDetector
    from clfacedetection_tpu.utils import photo_scene
    from clfacedetection_tpu.api import _to_gray
    spec = load_cascade("haarcascade_frontalface_alt")
    gray = jax.device_put(np.asarray(_to_gray(photo_scene((1080, 1920)))))
    cumn = np.cumsum([3, 16, 21, 39, 33, 44, 50, 51, 56, 71, 80, 103])
    prev_nodes, prev_ms = 0, 0.0
    for fk in (1, 2, 4, 6, 8, 10, 12):
        det = PyramidDetector(spec, (1080, 1920), min_size=(40, 40),
                              front_stages=fk, cap=16384)
        fr = jax.jit(lambda g, d=det: d._front_device(g)["front"]
                     .astype(jnp.int32).sum())
        ms = time_last(fr, gray, iters=10)
        cum = int(cumn[fk - 1])
        dms, dn = ms - prev_ms, cum - prev_nodes
        extra = (f"  (+{dms:6.2f} ms /{dn:4d} n = {dms/dn/NEL*1e12:5.1f}"
                 " ps/elem/node)" if prev_ms else "")
        print(f"front fk={fk:2d} nodes={cum:4d}: {ms:7.2f} ms{extra}",
              flush=True)
        prev_nodes, prev_ms = cum, ms

    det = PyramidDetector(spec, (1080, 1920), min_size=(40, 40),
                          front_stages=12, cap=16384)
    pp = jax.jit(lambda g, d=det: d._prep_planes(g)[0]["sum"][::64, ::64]
                 .astype(jnp.float32).sum())
    print(f"prep only: {time_last(pp, gray, iters=10):.2f} ms", flush=True)
    comp = jax.jit(lambda g, d=det: d._compact_device(
        d._front_device(g)["front"])[0][:8])
    print(f"front+compact: {time_last(comp, gray, iters=10):.2f} ms",
          flush=True)
    full = jax.jit(lambda g, d=det: d._detect_device(g)["packed"][:40])
    print(f"full pipeline: {time_last(full, gray, iters=10):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
