"""Canny edge detector: bit-exact vs cv2; JAX == NumPy twin; pruning
parity through the full scale-cascade detector."""

import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.ops.canny import canny, canny_np


def test_bit_exact_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for t in range(8):
        h, w = rng.integers(20, 160, 2)
        img = rng.integers(0, 256, (int(h), int(w)), np.uint8)
        if t % 2:
            img = cv2.GaussianBlur(img, (5, 5), 1.3)
        for lo, hi in ((0, 50), (30, 90), (50, 150)):
            ref = cv2.Canny(img, lo, hi, apertureSize=3)
            np.testing.assert_array_equal(canny_np(img, lo, hi), ref)


def test_jax_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 96), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(canny(jnp.asarray(img), 0, 50)), canny_np(img, 0, 50))


def test_canny_pruning_detector_parity():
    """CV_HAAR_DO_CANNY_PRUNING end to end: the detector reproduces the
    golden's pruned visit set exactly, on an image with genuinely
    low-edge regions so the pruning is active."""
    from clfacedetection_tpu.detect import (
        ScaleCascadeDetector, detect_multi_scale_reference)
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import synth_face

    img = synth_face((120, 160), noise=1.0)  # smooth background: few edges
    spec = load_cascade("haarcascade_frontalface_default")
    gold_p = detect_multi_scale_reference(
        img, spec, min_neighbors=0, max_stages=4, do_canny_pruning=True)
    gold = detect_multi_scale_reference(
        img, spec, min_neighbors=0, max_stages=4)
    assert len(gold_p) < len(gold), "pruning should remove candidates here"
    det = ScaleCascadeDetector(spec, img.shape, max_stages=4,
                               dtype=jnp.float64, do_canny_pruning=True)
    cand, _ = det.candidates(img)
    assert set(map(tuple, np.asarray(gold_p))) == set(map(tuple, cand))
