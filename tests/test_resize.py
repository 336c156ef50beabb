"""Resize tests: JAX == NumPy twin bit-exactly; both ~= cv2 INTER_LINEAR.

The framework pins the OpenCV 2.4-era scalar fixed-point algorithm (see
ops/resize.py); cv2 5.0's HAL rounds the separable composition slightly
differently, so the cv2 comparison allows <=1 LSB on a small fraction of
pixels while the two in-framework implementations must agree exactly.
"""

import numpy as np
import pytest

from clfacedetection_tpu.ops.resize import (
    resize_bilinear_u8, resize_bilinear_u8_np)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jax_matches_numpy_exactly(seed, rng):
    r = np.random.default_rng(seed)
    for _ in range(10):
        h, w = r.integers(5, 200, 2)
        f = r.uniform(1.01, 8.0)
        h2, w2 = max(1, round(h / f)), max(1, round(w / f))
        img = r.integers(0, 256, (int(h), int(w)), np.uint8)
        a = resize_bilinear_u8_np(img, (h2, w2))
        b = np.asarray(resize_bilinear_u8(img, (h2, w2)))
        np.testing.assert_array_equal(a, b)


def test_identity_when_same_size(rng):
    img = rng.integers(0, 256, (64, 48), np.uint8)
    np.testing.assert_array_equal(
        resize_bilinear_u8_np(img, (64, 48)), img)


def test_batched():
    r = np.random.default_rng(3)
    imgs = r.integers(0, 256, (4, 60, 90), np.uint8)
    out = np.asarray(resize_bilinear_u8(imgs, (33, 47)))
    for i in range(4):
        np.testing.assert_array_equal(
            out[i], resize_bilinear_u8_np(imgs[i], (33, 47)))


def test_close_to_cv2():
    cv2 = pytest.importorskip("cv2")
    r = np.random.default_rng(4)
    total = bad = 0
    worst = 0
    for _ in range(40):
        h, w = r.integers(5, 300, 2)
        f = r.uniform(1.01, 10.0)
        h2, w2 = max(1, round(h / f)), max(1, round(w / f))
        img = r.integers(0, 256, (int(h), int(w)), np.uint8)
        ref = cv2.resize(img, (w2, h2), interpolation=cv2.INTER_LINEAR)
        mine = resize_bilinear_u8_np(img, (h2, w2))
        d = np.abs(mine.astype(int) - ref.astype(int))
        bad += np.count_nonzero(d)
        total += d.size
        worst = max(worst, int(d.max()))
    assert worst <= 1, f"resize deviates >1 LSB from cv2 (worst {worst})"
    assert bad / total < 0.005, f"resize mismatch rate {bad/total:.4%}"
