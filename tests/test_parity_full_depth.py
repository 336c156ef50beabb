"""Full-depth parity at VGA scale (VERDICT round-1 weak #5).

Round-1 parity evidence ran at 120x160 with truncated cascades; this
exercises the *benchmark* cascade (frontalface_alt, 22 stages,
untruncated) on a real-photograph VGA frame, box-for-box against the
NumPy oracle in float64 — the rounding/overflow surface (variance
normalization, cvRound grids, stage sums) at realistic magnitudes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.detect import (
    PyramidDetector, detect_multi_scale_reference)
from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import photo_scene


@pytest.mark.slow
def test_full_depth_scale_image_vga():
    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    # the window range bounds the oracle's Python-per-window runtime;
    # the cascade itself is untruncated (all 22 stages)
    ref = detect_multi_scale_reference(
        img, spec, scale_factor=1.1, min_neighbors=0, min_size=(56, 56),
        max_size=(160, 160), mode="scale_image")
    det = PyramidDetector(spec, img.shape, scale_factor=1.1,
                          min_size=(56, 56), max_size=(160, 160),
                          dtype=jnp.float64)
    got, overflow = det.candidates(img)
    assert not overflow
    assert len(ref) > 0, "scene must produce candidates"
    assert {tuple(b) for b in ref.tolist()} == \
        {tuple(b) for b in got.tolist()}


@pytest.mark.slow
def test_full_depth_scale_cascade_vga():
    spec = load_cascade("haarcascade_frontalface_default")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    ref = detect_multi_scale_reference(
        img, spec, scale_factor=1.1, min_neighbors=0, min_size=(56, 56),
        max_size=(160, 160), mode="scale_cascade")
    det = ScaleCascadeDetector(spec, img.shape, scale_factor=1.1,
                               min_size=(56, 56), max_size=(160, 160),
                               dtype=jnp.float64)
    got, overflow = det.candidates(img)
    assert not overflow
    assert len(ref) > 0
    assert {tuple(b) for b in ref.tolist()} == \
        {tuple(b) for b in got.tolist()}


@pytest.mark.exhaustive
def test_1080p_candidate_sanity_f32():
    """1080p smoke in float32 (the TPU fast-path dtype): full-depth
    detection on the photo scene finds the pasted faces and a plausible
    candidate count.  Both 1080p sanities live in the ``exhaustive``
    lane (264 s / ~10 min of CPU XLA respectively); the slow lane's
    full-depth coverage is the VGA pair above, and 1080p runs on real
    hardware via bench.py and the TPU kernel suites."""
    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((1080, 1920))
    # front_stages=2 keeps the dense-front compile tractable on the CPU
    # backend (~15 min at the default depth); every stage still runs —
    # the remaining 20 live in the survivor tail
    det = PyramidDetector(spec, img.shape, scale_factor=1.1,
                          min_size=(64, 64), dtype=jnp.float32,
                          front_stages=2)
    res = det.detect(img, min_neighbors=3)
    assert not res.survivor_overflow
    assert 1 <= len(res.boxes) <= 100
    assert len(res.candidates) >= len(res.boxes)


@pytest.mark.exhaustive
def test_1080p_candidate_sanity_f64():
    """Full 1080p smoke at oracle precision (float64) — the heaviest CPU
    run in the suite, kept in the explicit ``exhaustive`` lane."""
    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((1080, 1920))
    det = PyramidDetector(spec, img.shape, scale_factor=1.1,
                          min_size=(64, 64), dtype=jnp.float64,
                          front_stages=2)
    res = det.detect(img, min_neighbors=3)
    assert not res.survivor_overflow
    assert 1 <= len(res.boxes) <= 100
    assert len(res.candidates) >= len(res.boxes)
