"""TPU-only mode coverage: scale-cascade + find-biggest-object on device.

Round 1 pinned scale-cascade to the CPU because the lax.scan-over-scales
program crashes the TPU runtime worker at >=VGA ('TPU worker process
crashed or restarted', reproduced 2026-08-17).  The TPU path unrolls the
scale loop into per-scale dispatches (detector._detect_unrolled) that
all share ONE compiled program (per-scale tables are runtime args, not
baked literals) — full-depth VGA compile+detect dropped from ~30 min of
per-scale compiles to well under a minute, bounded by a test below."""

import time

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="TPU execution paths")


def test_scale_cascade_compile_bound_full_depth_vga():
    """Full-depth (22-stage) VGA scale-cascade: one shared per-scale
    program => cold-ish build + first detect must stay under 4 minutes
    (measured ~34 s; the old per-scale-literal design took ~30 min)."""
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    t0 = time.time()
    # front_stages=3 pins the original shared-program compile bound; the
    # round-4 TPU default (front_stages=n_stages, 15.6x faster steady
    # state) trades a longer one-off compile (~12 min cold, persistent-
    # cached) for the removed gather tail -- see docs/PERF.md
    det = ScaleCascadeDetector(spec, img.shape, scale_factor=1.1,
                               min_size=(56, 56), max_size=(160, 160),
                               front_stages=3)
    got, ovf = det.candidates(img)
    elapsed = time.time() - t0
    assert not ovf
    assert len(got) > 0
    assert elapsed < 240, f"compile+detect took {elapsed:.0f}s"


def test_scale_cascade_tpu_parity():
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    from clfacedetection_tpu.detect.reference_impl import \
        detect_multi_scale_reference
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_default")
    img = photo_scene((240, 320), face_sizes=(60, 100))
    det = ScaleCascadeDetector(spec, img.shape, scale_factor=1.1,
                               min_size=(40, 40), max_stages=6)
    assert det._use_unrolled
    got, ovf = det.candidates(img)
    assert not ovf
    ref = detect_multi_scale_reference(
        img, spec, scale_factor=1.1, min_neighbors=0, min_size=(40, 40),
        mode="scale_cascade", max_stages=6)
    assert len(ref) > 0
    assert {tuple(b) for b in ref.tolist()} == \
        {tuple(b) for b in got.tolist()}


def test_find_biggest_object_tpu():
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    from clfacedetection_tpu.detect.reference_impl import \
        detect_multi_scale_reference
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_default")
    img = photo_scene((240, 320), face_sizes=(60, 100))
    ref = detect_multi_scale_reference(
        img, spec, scale_factor=1.1, min_neighbors=1, min_size=(40, 40),
        find_biggest_object=True, max_stages=6)
    det = ScaleCascadeDetector(spec, img.shape, scale_factor=1.1,
                               min_size=(0, 0), max_stages=6)
    got = det.find_biggest_object(img, min_neighbors=1,
                                  min_size=(40, 40))
    assert np.array_equal(np.asarray(ref), got)
