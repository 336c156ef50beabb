"""Public API surface: CascadeClassifier, detect_objects, flags."""

import numpy as np
import pytest

from clfacedetection_tpu import (
    CascadeClassifier, WeightedRect, detect_objects)
from clfacedetection_tpu.api import (
    CLOD_PER_STAGE_ITERATIONS, CLOD_PRECOMPUTE_FEATURES,
    CV_HAAR_FIND_BIGGEST_OBJECT)
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face


@pytest.fixture(scope="module")
def image():
    return synth_face((120, 160))


def test_detect_multi_scale_finds_face(image):
    clf = CascadeClassifier("haarcascade_frontalface_default")
    boxes = clf.detect_multi_scale(image, min_neighbors=1)
    assert len(boxes) >= 1
    x, y, w, h = boxes[0]
    assert abs((x + w / 2) - 80) < 15 and abs((y + h / 2) - 60) < 15


def test_detect_multi_scale2_neighbor_counts(image):
    """The (boxes, num_detections) overload: same boxes as
    detect_multi_scale, counts >= min_neighbors per grouped box."""
    clf = CascadeClassifier("haarcascade_frontalface_default")
    boxes, counts = clf.detect_multi_scale2(image, min_neighbors=1)
    ref = clf.detect_multi_scale(image, min_neighbors=1)
    assert np.array_equal(boxes, ref)
    assert len(counts) == len(boxes) and np.all(counts >= 1)


def test_bgr_input(image):
    bgr = np.stack([image] * 3, axis=-1)
    clf = CascadeClassifier("haarcascade_frontalface_default")
    assert len(clf.detect_multi_scale(bgr, min_neighbors=1)) >= 1


def test_detect_objects_clod_api(image):
    matches = detect_objects(
        image, "haarcascade_frontalface_default",
        min_window_size=(24, 24), min_neighbors=1,
        flags=CLOD_PRECOMPUTE_FEATURES | CLOD_PER_STAGE_ITERATIONS)
    assert all(isinstance(m, WeightedRect) for m in matches)
    assert len(matches) >= 1
    # CPU fallback path (the use_opencl=false analog) agrees on boxes
    ref = detect_objects(image, "haarcascade_frontalface_default",
                         min_window_size=(24, 24), min_neighbors=1,
                         use_tpu=False)
    # both find the face; exact sets may differ across pyramid modes
    assert len(ref) >= 1


def test_clod_strategies_agree(image):
    """The three execution strategies behind the clod_flags bits
    (per_stage / block / direct, clod.cpp:1339-1500) produce the same
    candidate boxes — different schedules, one semantics."""
    from clfacedetection_tpu.api import CLOD_BLOCK_IMPLEMENTATION
    res = {}
    for name, flags in (("per_stage", CLOD_PER_STAGE_ITERATIONS),
                        ("block", CLOD_BLOCK_IMPLEMENTATION),
                        ("direct", 0)):
        m = detect_objects(image, "haarcascade_frontalface_default",
                           min_window_size=(24, 24), min_neighbors=0,
                           flags=flags)
        res[name] = {(r.x, r.y, r.width, r.height) for r in m}
    assert res["per_stage"] == res["block"] == res["direct"]
    assert len(res["per_stage"]) >= 1


def test_scale_cascade_strategies_agree(image):
    """Staged vs non-staged scale-cascade tails: identical boxes."""
    import jax.numpy as jnp
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    from clfacedetection_tpu.models import load_cascade
    spec = load_cascade("haarcascade_frontalface_default")
    outs = []
    for strat in ("per_stage", "block"):
        det = ScaleCascadeDetector(spec, image.shape, min_size=(24, 24),
                                   dtype=jnp.float64, strategy=strat)
        c, _ = det.candidates(image)
        outs.append({tuple(b) for b in c.tolist()})
    assert outs[0] == outs[1]
    assert len(outs[0]) >= 1


def test_find_biggest_object_flag(image):
    clf = CascadeClassifier("haarcascade_frontalface_default",
                            mode="scale_cascade")
    res = clf.detect_multi_scale_full(image, min_neighbors=1,
                                      flags=CV_HAAR_FIND_BIGGEST_OBJECT)
    assert len(res.boxes) == 1


def test_find_biggest_object_device_driver_on_cpu():
    """The DEVICE FBO driver (ScaleCascadeDetector.find_biggest_object:
    descending scales, ROI-shrink, min-size raise) vs the oracle's FBO,
    on the CPU backend.  The public API's CPU path falls back to the
    NumPy oracle, which used to leave the device driver TPU-only
    (test_tpu_modes) — this is the same parity check in the default
    lane."""
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    from clfacedetection_tpu.detect.reference_impl import \
        detect_multi_scale_reference
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_default")
    img = photo_scene((240, 320), face_sizes=(60, 100))
    ref = detect_multi_scale_reference(
        img, spec, scale_factor=1.1, min_neighbors=1, min_size=(40, 40),
        find_biggest_object=True, max_stages=6)
    det = ScaleCascadeDetector(spec, img.shape, scale_factor=1.1,
                               min_size=(0, 0), max_stages=6)
    got = det.find_biggest_object(img, min_neighbors=1, min_size=(40, 40))
    assert np.array_equal(np.asarray(ref), got)


def test_single_scale_config1(image):
    """BASELINE config 1: single pyramid level (min_size == max_size ==
    base window) — golden vs pyramid parity at exactly one scale."""
    import jax.numpy as jnp
    from clfacedetection_tpu.detect import (
        PyramidDetector, detect_multi_scale_reference)
    spec = load_cascade("haarcascade_frontalface_default")
    gold = detect_multi_scale_reference(
        image, spec, min_neighbors=0, mode="scale_image",
        min_size=(24, 24), max_size=(24, 24), max_stages=6)
    det = PyramidDetector(spec, image.shape, min_size=(24, 24),
                          max_size=(24, 24), max_stages=6,
                          dtype=jnp.float64)
    assert det.n_levels == 1
    cand, _ = det.candidates(image)
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, cand))


@pytest.mark.slow
def test_multi_cascade_batch():
    """BASELINE config 5 shape: several cascades over one frame batch."""
    from clfacedetection_tpu.runtime import BatchedPyramidDetector
    frames = np.stack([synth_face((96, 128), size=30.0, seed=i)
                       for i in range(2)])
    for name in ("haarcascade_frontalface_default",
                 "haarcascade_profileface",
                 "haarcascade_upperbody"):
        det = BatchedPyramidDetector(load_cascade(name), (96, 128), 2,
                                     max_stages=4)
        res = det.detect(frames, min_neighbors=0)
        assert len(res) == 2
