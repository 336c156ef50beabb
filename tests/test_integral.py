"""Integral-image ops vs the cv2 oracle.

The reference's only integral test was a single debugger-inspected element
(main.cpp:63-69); here every element of every plane is compared, including
the tilted RSAT and the reconstructed sqsum (the reference GPU sqsum was
known-broken, clif.cl:113-118 / SURVEY.md C2).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clfacedetection_tpu.ops import bgr_to_gray, integral_images, tilted_integral


SHAPES = [(6, 7), (64, 64), (480, 640), (37, 123), (1, 1), (5, 200)]


@pytest.mark.parametrize("shape", SHAPES)
def test_integral_sum_sqsum(rng, shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    s_cv, sq_cv = cv2.integral2(img, sdepth=cv2.CV_32S, sqdepth=cv2.CV_64F)
    ii = integral_images(img)
    np.testing.assert_array_equal(np.asarray(ii.sum), s_cv)
    np.testing.assert_array_equal(ii.sqsum_f64(), sq_cv)


@pytest.mark.parametrize("shape", SHAPES)
def test_tilted_integral(rng, shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    _, _, t_cv = cv2.integral3(img, sdepth=cv2.CV_32S, sqdepth=cv2.CV_64F)
    t = tilted_integral(img)
    np.testing.assert_array_equal(np.asarray(t), t_cv)


def test_integral_batched(rng):
    imgs = rng.integers(0, 256, (3, 33, 47), dtype=np.uint8)
    ii = integral_images(imgs, with_tilted=True)
    for b in range(3):
        s_cv, _, t_cv = cv2.integral3(imgs[b], sdepth=cv2.CV_32S,
                                      sqdepth=cv2.CV_64F)
        np.testing.assert_array_equal(np.asarray(ii.sum[b]), s_cv)
        np.testing.assert_array_equal(np.asarray(ii.tilted[b]), t_cv)


def test_sq_planes_window_exactness(rng):
    """4-corner differences of the two sq planes reconstruct exact window
    sqsums (the property the variance normalization relies on)."""
    img = rng.integers(0, 256, (100, 120), dtype=np.uint8)
    ii = integral_images(img)
    hi = np.asarray(ii.sq_hi, np.int64)
    lo = np.asarray(ii.sq_lo, np.int64)
    p2 = img.astype(np.int64) ** 2
    for (y, x, h, w) in [(0, 0, 100, 120), (3, 5, 24, 24), (50, 90, 37, 11)]:
        win_hi = hi[y + h, x + w] - hi[y, x + w] - hi[y + h, x] + hi[y, x]
        win_lo = lo[y + h, x + w] - lo[y, x + w] - lo[y + h, x] + lo[y, x]
        assert win_hi * 256 + win_lo == p2[y:y + h, x:x + w].sum()


def test_bgr_to_gray_cv(rng):
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    gray_cv = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    gray = np.asarray(bgr_to_gray(img, mode="cv"))
    np.testing.assert_array_equal(gray, gray_cv)


def test_bgr_to_gray_clif(rng):
    """Reference kernel semantics: float mac, trunc toward zero
    (clif.cl:13-17)."""
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    f = (0.114 * img[..., 0].astype(np.float32)
         + 0.587 * img[..., 1].astype(np.float32)
         + 0.299 * img[..., 2].astype(np.float32))
    expected = np.clip(f.astype(np.int32), 0, 255).astype(np.uint8)
    gray = np.asarray(bgr_to_gray(img, mode="clif"))
    np.testing.assert_array_equal(gray, expected)

def test_bgr_to_gray_per_row(rng):
    """Per-row-vectorized twin (clif.cl:35-74): identical output to the
    per-pixel kernel in both coefficient modes."""
    from clfacedetection_tpu.ops import bgr_to_gray_per_row
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    for mode in ("cv", "clif"):
        np.testing.assert_array_equal(
            np.asarray(bgr_to_gray_per_row(img, mode=mode)),
            np.asarray(bgr_to_gray(img, mode=mode)))
    batched = rng.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(bgr_to_gray_per_row(batched)),
        np.asarray(bgr_to_gray(batched, mode="clif")))


def test_bgra_to_gray_cv(rng):
    """BGRA capability twin (clif.cl:20-33 intent; bit-exact vs cv2's
    BGRA2GRAY, which applies the BGR coefficients and ignores alpha)."""
    from clfacedetection_tpu.ops import bgra_to_gray
    img = rng.integers(0, 256, (64, 80, 4), dtype=np.uint8)
    gray_cv = cv2.cvtColor(img, cv2.COLOR_BGRA2GRAY)
    gray = np.asarray(bgra_to_gray(img, mode="cv"))
    np.testing.assert_array_equal(gray, gray_cv)
    with pytest.raises(ValueError):
        bgra_to_gray(img[..., :3])
