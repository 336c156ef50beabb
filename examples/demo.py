#!/usr/bin/env python
"""Demo / benchmark app — the TPU-native analog of the reference's
``main.cpp`` (CLFaceDetection/main.cpp:19-187).

The reference loads ``haarcascade_frontalface_default``, a 640x480 frame,
then times the OpenCV baseline against its CLOD CPU variants and GPU path,
drawing each result in a HighGUI window (main.cpp:72-97).  Here:

* baseline      = the golden oracle (the OpenCV 2.4 semantics in NumPy)
* scale_cascade = the TPU scale-cascade engine (the demo's flags=0 mode)
* scale_image   = the TPU pyramid fast path
* batched       = the frames/sec webcam-loop analog (main.cpp:104-125)

Boxes are compared box-for-box and annotated frames are written as PPM
(no GUI in this environment).  Pass --image to use a real photo (any
cv2-readable format) instead of the synthetic scene.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def draw_boxes(gray, boxes, path):
    rgb = np.stack([gray] * 3, axis=-1)
    for x, y, w, h in np.asarray(boxes).reshape(-1, 4):
        x2, y2 = min(x + w, rgb.shape[1] - 1), min(y + h, rgb.shape[0] - 1)
        rgb[y, x:x2] = rgb[y2, x:x2] = (255, 32, 32)
        rgb[y:y2, x] = rgb[y:y2, x2] = (255, 32, 32)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
        f.write(rgb.astype(np.uint8).tobytes())
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cascade", default="haarcascade_frontalface_default")
    ap.add_argument("--image", default=None, help="path to a photo")
    ap.add_argument("--min-size", type=int, default=40)
    ap.add_argument("--min-neighbors", type=int, default=0,
                    help="reference demo uses 0 (main.cpp:165)")
    ap.add_argument("--skip-baseline", action="store_true",
                    help="skip the (slow) NumPy oracle baseline")
    ap.add_argument("--out-dir", default="/tmp/clfd_demo")
    args = ap.parse_args()

    from clfacedetection_tpu import CascadeClassifier
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import ElapseTime, synth_scene

    if args.image:
        import cv2
        img = cv2.imread(args.image, cv2.IMREAD_GRAYSCALE)
        img = cv2.resize(img, (640, 480))  # main.cpp:47-51
    else:
        img = synth_scene((480, 640), faces=[(200, 200, 60), (280, 460, 90)])
    os.makedirs(args.out_dir, exist_ok=True)
    spec = load_cascade(args.cascade)
    mn, msz = args.min_neighbors, (args.min_size, args.min_size)
    t = ElapseTime()
    results = {}

    if not args.skip_baseline:
        from clfacedetection_tpu.detect import detect_multi_scale_reference
        t.start()
        results["oracle (OpenCV-2.4 semantics, NumPy)"] = \
            detect_multi_scale_reference(img, spec, min_neighbors=mn,
                                         min_size=msz)
        print(f"Oracle baseline: {t.get():9.2f} ms")

    for mode in ("scale_image", "scale_cascade"):
        try:
            clf = CascadeClassifier(spec, mode=mode)
            clf.detect_multi_scale(img, min_neighbors=mn,
                                   min_size=msz)  # warm
            t.start()
            boxes = clf.detect_multi_scale(img, min_neighbors=mn,
                                           min_size=msz)
            print(f"TPU {mode:14s}: {t.get():9.2f} ms   {len(boxes)} boxes")
            results[f"tpu {mode}"] = boxes
        except Exception as e:  # keep the demo usable per-mode
            print(f"TPU {mode:14s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")

    for name, boxes in results.items():
        p = draw_boxes(img, boxes, os.path.join(
            args.out_dir, name.split()[0] + "_" +
            name.split()[1].strip("(),") + ".ppm"))
        print(f"  {name:40s} {len(boxes):3d} boxes -> {p}")

    if "oracle (OpenCV-2.4 semantics, NumPy)" in results:
        o = {tuple(b) for b in
             np.asarray(results["oracle (OpenCV-2.4 semantics, NumPy)"]
                        ).tolist()}
        sc = {tuple(b) for b in np.asarray(results["tpu scale_cascade"]
                                           ).tolist()}
        print("scale_cascade box-for-box vs oracle:",
              "MATCH" if o == sc else f"{len(o ^ sc)} differ (f32 mode)")

    # webcam-loop analog: batched throughput (main.cpp:104-125)
    from clfacedetection_tpu.runtime import BatchedPyramidDetector
    B = 8
    frames = np.stack([img] * B)
    det = BatchedPyramidDetector(spec, img.shape, B, min_size=msz)
    det.detect(frames, min_neighbors=mn)  # warm
    t.start()
    n = 5
    for _ in range(n):
        det.detect(frames, min_neighbors=mn)
    ms = t.get() / (n * B)
    print(f"batched video ({img.shape[1]}x{img.shape[0]}, batch {B}): "
          f"{ms:.2f} ms/frame = {1000/ms:.1f} fps")

    # BASELINE config 5 analog: several cascades over the same batch in
    # one fused program (the reference times one cvHaarDetectObjects
    # call per cascade, main.cpp:72-97)
    try:
        from clfacedetection_tpu.runtime import MultiCascadeBatchedDetector
        multi_names = ["haarcascade_frontalface_default",
                       "haarcascade_profileface"]
        multi = MultiCascadeBatchedDetector(
            [load_cascade(nm) for nm in multi_names], img.shape, B,
            min_size=msz)
        multi.detect(frames, min_neighbors=mn)  # warm
        t.start()
        for _ in range(n):
            res = multi.detect(frames, min_neighbors=mn)
        ms = t.get() / (n * B)
        counts = ", ".join(f"{nm.split('_', 1)[1]}={len(res[k][0].boxes)}"
                           for k, nm in enumerate(multi_names))
        print(f"multi-cascade fused (x{len(multi_names)}, batch {B}): "
              f"{ms:.2f} ms/frame = {1000/ms:.1f} fps   [{counts}]")
    except Exception as e:
        print(f"multi-cascade fused: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})")

    # intra-frame latency axis: canvas scan rows strip-sharded over the
    # mesh (the reference CPU baseline's TBB strips, tempcv.cpp:1305-1311)
    try:
        import jax
        from jax.sharding import Mesh
        from clfacedetection_tpu.detect import PyramidDetector
        from clfacedetection_tpu.parallel import StripShardedPyramidDetector
        k = min(len(jax.devices()), 8)
        pdet = PyramidDetector(spec, img.shape, min_size=msz)
        ref_c, _ = pdet.candidates(img)
        sdet = StripShardedPyramidDetector(
            pdet, Mesh(np.array(jax.devices()[:k]), ("strips",)))
        got_c, _ = sdet.candidates(img)
        print(f"row-strip sharded ({k} strips): "
              f"{'box-for-box MATCH' if np.array_equal(got_c, ref_c) else 'MISMATCH'}"
              f" ({len(got_c)} candidates)")
    except Exception as e:
        print(f"row-strip sharded: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})")


if __name__ == "__main__":
    main()
