import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import bench
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.runtime import BatchedPyramidDetector
from clfacedetection_tpu.utils import photo_scene
vga = photo_scene((480, 640))
reps, passes = 10, 4
for name in ("haarcascade_frontalface_default", "haarcascade_frontalface_alt"):
    vb = bench._vga_batch(name, 16)
    vframes = np.broadcast_to(vga, (vb,) + vga.shape).copy()
    vdet = BatchedPyramidDetector(load_cascade(name), vga.shape, vb, min_size=(40, 40))
    vdet.detect(vframes, min_neighbors=3)
    vdev = bench._device_ms(vdet, vframes, reps)
    e2es = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in vdet.detect_stream((vframes for _ in range(reps)), min_neighbors=3, depth=3):
            pass
        e2es.append((time.perf_counter() - t0) / (reps * vb))
    print(f"{name} b{vb}: device {vdev:.2f} ms/frame ({1e3/vdev:.1f} fps), "
          f"e2e best {min(e2es)*1e3:.2f} ms ({1/min(e2es):.1f} fps), "
          f"median {sorted(e2es)[len(e2es)//2]*1e3:.2f} ms")
