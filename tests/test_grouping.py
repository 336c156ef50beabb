"""Unit tests for rectangle grouping (AgroupRectangles semantics,
reference tempcv.cpp:145-243)."""

import numpy as np

from clfacedetection_tpu.detect.grouping import (
    group_rectangles, partition_similar)


def test_partition_two_clusters():
    boxes = np.array([
        [10, 10, 40, 40], [12, 11, 40, 40], [9, 13, 41, 39],   # cluster A
        [200, 200, 50, 50], [203, 198, 49, 51],                # cluster B
    ])
    labels, n = partition_similar(boxes, eps=0.2)
    assert n == 2
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_group_threshold_drops_singletons():
    boxes = np.array([
        [10, 10, 40, 40], [12, 11, 40, 40], [9, 13, 41, 39],
        [300, 300, 30, 30],                                    # singleton
    ])
    out, neigh = group_rectangles(boxes, group_threshold=2, eps=0.2)
    assert len(out) == 1
    assert neigh[0] == 3
    # class average with float32 1/n scaling + C truncation
    # (tempcv.cpp:188-195)
    s = np.float32(1.0) / np.float32(3.0)
    exp = (boxes[:3].sum(0).astype(np.float32) * s).astype(np.int64)
    np.testing.assert_array_equal(out[0], exp)


def test_zero_threshold_passthrough():
    boxes = np.array([[1, 2, 3, 4], [100, 2, 3, 4]])
    out, neigh = group_rectangles(boxes, group_threshold=0)
    np.testing.assert_array_equal(out, boxes)
    np.testing.assert_array_equal(neigh, [1, 1])


def test_small_inside_large_suppressed():
    # 4 small boxes nested inside a big cluster of 5: the small class is
    # suppressed when n2 > max(3, n1) (tempcv.cpp:222-231).
    big = [[100, 100, 100, 100]] * 5
    small = [[130, 130, 20, 20]] * 4
    boxes = np.array(big + small)
    out, neigh = group_rectangles(boxes, group_threshold=3, eps=0.2)
    assert len(out) == 1
    assert tuple(out[0]) == (100, 100, 100, 100)


def test_empty():
    out, neigh = group_rectangles(np.zeros((0, 4)), 3)
    assert out.shape == (0, 4) and neigh.shape == (0,)
