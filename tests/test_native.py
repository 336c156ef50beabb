"""Native C++ grouping == Python specification, element for element."""

import numpy as np
import pytest

from clfacedetection_tpu import native
from clfacedetection_tpu.detect import grouping


pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def _py_group(boxes, thr, eps=0.2, variant="opencv"):
    import os
    os.environ["CLFD_NO_NATIVE"] = "1"
    try:
        return grouping.group_rectangles(boxes, thr, eps, variant)
    finally:
        del os.environ["CLFD_NO_NATIVE"]


def _random_boxes(rng, n):
    # clustered boxes: a few centers with jitter, plus outliers
    centers = rng.integers(0, 400, (max(n // 8, 1), 4))
    centers[:, 2:] = rng.integers(20, 120, (len(centers), 2))
    picks = centers[rng.integers(0, len(centers), n)]
    jitter = rng.integers(-6, 7, (n, 4))
    return np.maximum(picks + jitter, 1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thr", [1, 2, 3])
def test_native_matches_python(seed, thr):
    rng = np.random.default_rng(seed)
    boxes = _random_boxes(rng, 120)
    nb, nn = native.group_rectangles_native(boxes, thr)
    pb, pn = _py_group(boxes, thr)
    np.testing.assert_array_equal(nb, pb)
    np.testing.assert_array_equal(nn, pn)


def test_native_partition_matches():
    rng = np.random.default_rng(9)
    boxes = _random_boxes(rng, 80)
    nl, nc = native.partition_native(boxes, 0.2)
    pl, pc = grouping.partition_similar(boxes, 0.2)
    assert nc == pc
    np.testing.assert_array_equal(nl, pl)


def test_native_empty_and_zero_threshold():
    nb, nn = native.group_rectangles_native(np.zeros((0, 4)), 3)
    assert len(nb) == 0
    boxes = np.array([[1, 2, 3, 4], [50, 60, 7, 8]])
    nb, nn = native.group_rectangles_native(boxes, 0)
    np.testing.assert_array_equal(nb, boxes)
    np.testing.assert_array_equal(nn, [1, 1])
