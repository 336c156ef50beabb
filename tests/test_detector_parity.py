"""Box-for-box parity: JAX detector vs the NumPy golden oracle.

The reference's correctness definition is behavioral equivalence with
OpenCV 2.4's cvHaarDetectObjects (SURVEY.md section 4); the golden
(detect.reference_impl) encodes those semantics, and the TPU path must
produce the *identical* candidate set in float64 mode — same windows,
same scan visit set (skip-by-2), same variance normalization and votes.

Cascades are truncated to a few stages so synthetic images keep the
candidate sets non-empty; the truncation preserves every evaluation path
(stumps, CART trees, tilted rects, stage-tree traversal).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.detect import (
    ScaleCascadeDetector, detect_multi_scale_reference)
from clfacedetection_tpu.detect.grouping import group_rectangles
from clfacedetection_tpu.models import load_cascade


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (120, 160), np.uint8)
    yy, xx = np.mgrid[0:120, 0:160]
    blob = 120 * np.exp(-((yy - 60) ** 2 + (xx - 80) ** 2) / 800.0)
    return np.clip(img * 0.5 + blob, 0, 255).astype(np.uint8)


CASES = [
    # (cascade, truncation) — families: pure stumps / CART trees /
    # tilted rects / stage-tree links
    ("haarcascade_frontalface_default", 4),   # stumps, 24x24
    pytest.param("haarcascade_frontalface_alt2", 4,
                 marks=pytest.mark.slow),      # CART depth-2 trees
    ("haarcascade_mcs_nose", 4),              # tilted features
    pytest.param("haarcascade_frontalface_alt_tree", 6, marks=pytest.mark.slow),  # stage tree
]


@pytest.mark.parametrize("name,max_stages", CASES)
def test_candidate_parity(image, name, max_stages):
    spec = load_cascade(name)
    gold = detect_multi_scale_reference(
        image, spec, min_neighbors=0, max_stages=max_stages)
    det = ScaleCascadeDetector(spec, image.shape, max_stages=max_stages,
                               dtype=jnp.float64, front_stages=3)
    cand, overflow = det.candidates(image)
    assert not overflow
    gs = set(map(tuple, np.asarray(gold)))
    js = set(map(tuple, cand))
    assert len(gs) > 0, "test image must produce candidates"
    assert gs == js, (f"{name}: {len(gs - js)} golden-only, "
                      f"{len(js - gs)} jax-only boxes")


@pytest.mark.slow
def test_grouped_parity(image):
    spec = load_cascade("haarcascade_frontalface_default")
    gold = detect_multi_scale_reference(
        image, spec, min_neighbors=2, max_stages=4)
    det = ScaleCascadeDetector(spec, image.shape, max_stages=4,
                               dtype=jnp.float64)
    res = det.detect(image, min_neighbors=2)
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, res.boxes))


@pytest.mark.slow
def test_full_cascade_real_detections():
    """Full 25-stage cascade end to end on a synthetic face — the two
    implementations must agree on actual (non-empty) detections."""
    from clfacedetection_tpu.utils import synth_face
    img = synth_face()
    spec = load_cascade("haarcascade_frontalface_default")
    gold = detect_multi_scale_reference(img, spec, min_neighbors=0)
    det = ScaleCascadeDetector(spec, img.shape, dtype=jnp.float64)
    cand, overflow = det.candidates(img)
    assert not overflow
    assert len(gold) > 0, "synthetic face must be detected"
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, cand))


def test_min_size_scales(image):
    """min_size filters pyramid levels exactly like the reference
    (skip inside the factor loop, tempcv.cpp:1377-1382)."""
    spec = load_cascade("haarcascade_frontalface_default")
    gold = detect_multi_scale_reference(
        image, spec, min_neighbors=0, min_size=(40, 40), max_stages=3)
    det = ScaleCascadeDetector(spec, image.shape, min_size=(40, 40),
                               max_stages=3, dtype=jnp.float64)
    cand, _ = det.candidates(image)
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, cand))
    assert all(b[2] >= 40 for b in cand)


@pytest.mark.slow
def test_float32_mode_close(image):
    """float32 execution (the TPU fast mode) may flip borderline votes but
    must agree on the overwhelming majority of candidates."""
    spec = load_cascade("haarcascade_frontalface_default")
    det64 = ScaleCascadeDetector(spec, image.shape, max_stages=4,
                                 dtype=jnp.float64)
    det32 = ScaleCascadeDetector(spec, image.shape, max_stages=4,
                                 dtype=jnp.float32)
    c64 = set(map(tuple, det64.candidates(image)[0]))
    c32 = set(map(tuple, det32.candidates(image)[0]))
    union = max(len(c64 | c32), 1)
    jaccard = len(c64 & c32) / union
    assert jaccard > 0.98, f"f32/f64 candidate Jaccard {jaccard:.4f}"
