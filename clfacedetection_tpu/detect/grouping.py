"""Rectangle grouping (non-maximum suppression via similarity classes).

Host-side (NumPy) port of OpenCV's ``groupRectangles`` as carried in the
reference (``AgroupRectangles`` + ``ASimilarRects``, tempcv.cpp:129-243,
and ``cv::partition`` union-find).  Grouping is inherently sequential
union-find over a few hundred boxes, so it stays on the host behind the
API, exactly like the reference applies it after device readback
(clod.cpp:1324-1326); SURVEY.md section 7 "hard parts" #6.

The reference's own C port of this routine has two bugs (inverted INT_MAX
clamp and ``r1.width + r1.width`` containment test — clod.cpp:333-339,
SURVEY.md C9); we implement the *correct* OpenCV semantics, with the buggy
variant available as ``variant="clod"`` for behavioral-parity studies.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

__all__ = ["group_rectangles", "group_rectangles_levels",
           "partition_similar"]


def _similar(r1: np.ndarray, r2: np.ndarray, eps: float) -> bool:
    """ASimilarRects (tempcv.cpp:129-143)."""
    delta = eps * (min(r1[2], r2[2]) + min(r1[3], r2[3])) * 0.5
    return (abs(r1[0] - r2[0]) <= delta
            and abs(r1[1] - r2[1]) <= delta
            and abs(r1[0] + r1[2] - r2[0] - r2[2]) <= delta
            and abs(r1[1] + r1[3] - r2[1] - r2[3]) <= delta)


def partition_similar(boxes: np.ndarray, eps: float) -> Tuple[np.ndarray, int]:
    """cv::partition with ASimilarRects: union-find with path compression
    and rank union (the semantics of partitionData, clod.cpp:194-280).

    Returns (labels [n], n_classes); labels are 0..n_classes-1 in first-
    appearance order of each class root, matching cv::partition.
    """
    n = len(boxes)
    parent = np.arange(n)
    rank = np.zeros(n, np.int32)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if _similar(boxes[i], boxes[j], eps):
                ri, rj = find(i), find(j)
                if ri != rj:
                    if rank[ri] < rank[rj]:
                        ri, rj = rj, ri
                    parent[rj] = ri
                    if rank[ri] == rank[rj]:
                        rank[ri] += 1

    labels = np.empty(n, np.int32)
    root_to_label = {}
    for i in range(n):
        r = find(i)
        if r not in root_to_label:
            root_to_label[r] = len(root_to_label)
        labels[i] = root_to_label[r]
    return labels, len(root_to_label)


def group_rectangles(boxes: np.ndarray, group_threshold: int,
                     eps: float = 0.2,
                     variant: str = "opencv") -> Tuple[np.ndarray, np.ndarray]:
    """Group candidate boxes; returns (boxes [m,4] int32, neighbors [m]).

    Exact AgroupRectangles semantics (tempcv.cpp:145-243):
    1. partition into similarity classes,
    2. average each class with float ``1.f/n`` scaling and C truncation,
    3. drop classes with ``<= group_threshold`` members,
    4. drop small classes contained (within an eps margin) in a bigger
       class when ``n2 > max(3, n1) or n1 < 3``.
    """
    boxes = np.asarray(boxes, np.int64).reshape(-1, 4)
    if group_threshold <= 0 or len(boxes) == 0:
        return boxes.astype(np.int32), np.ones(len(boxes), np.int32)

    # Prefer the native C++ twin (same semantics, O(n^2) loops in C); the
    # Python path below is the specification and fallback.
    if os.environ.get("CLFD_NO_NATIVE") != "1":
        from ..native import group_rectangles_native
        out = group_rectangles_native(boxes, group_threshold, eps, variant)
        if out is not None:
            return out

    labels, ncls = partition_similar(boxes, eps)
    sums = np.zeros((ncls, 4), np.int64)
    np.add.at(sums, labels, boxes)
    counts = np.bincount(labels, minlength=ncls).astype(np.int32)
    # float32 reciprocal multiply + trunc-toward-zero (tempcv.cpp:188-195)
    s = (np.float32(1.0) / counts.astype(np.float32))[:, None]
    rrects = (sums.astype(np.float32) * s).astype(np.int64)

    keep = []
    out_n = []
    for i in range(ncls):
        r1 = rrects[i]
        n1 = int(counts[i])
        if n1 <= group_threshold:
            continue
        contained = False
        for j in range(ncls):
            n2 = int(counts[j])
            if j == i or n2 <= group_threshold:
                continue
            r2 = rrects[j]
            if variant == "clod":
                # the reference port's bugs (clod.cpp:333-339): the clamp
                # maxes with INT_MAX (so dx/dy are huge) and the right edge
                # uses width+width — kept for behavioral parity studies.
                dx = max(int(r2[2] * eps), np.iinfo(np.int32).max)
                dy = max(int(r2[3] * eps), np.iinfo(np.int32).max)
                inside = (r1[0] >= r2[0] - dx and r1[1] >= r2[1] - dy
                          and r1[2] + r1[2] <= r2[0] + r2[2] + dx
                          and r1[3] + r1[3] <= r2[1] + r2[3] + dy)
            else:
                dx = int(r2[2] * eps)
                dy = int(r2[3] * eps)
                inside = (r1[0] >= r2[0] - dx and r1[1] >= r2[1] - dy
                          and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                          and r1[1] + r1[3] <= r2[1] + r2[3] + dy)
            if inside and (n2 > max(3, n1) or n1 < 3):
                contained = True
                break
        if not contained:
            keep.append(r1)
            out_n.append(n1)

    if not keep:
        return np.zeros((0, 4), np.int32), np.zeros((0,), np.int32)
    return np.stack(keep).astype(np.int32), np.asarray(out_n, np.int32)


def group_rectangles_levels(boxes: np.ndarray, reject_levels: np.ndarray,
                            level_weights: np.ndarray, group_threshold: int,
                            eps: float = 0.2):
    """ROC-output grouping overload (tempcv.cpp:162-186, 213-216, 240-243):
    each class reports the max member reject level (ties broken by larger
    level weight); the keep test uses the class's reject level against
    ``group_threshold`` while containment still uses member counts.

    Returns (boxes [m,4], reject_levels [m], level_weights [m]).
    """
    boxes = np.asarray(boxes, np.int64).reshape(-1, 4)
    reject_levels = np.asarray(reject_levels, np.int64)
    level_weights = np.asarray(level_weights, np.float64)
    if group_threshold <= 0 or len(boxes) == 0:
        return (boxes.astype(np.int32), reject_levels.astype(np.int32),
                level_weights)

    labels, ncls = partition_similar(boxes, eps)
    sums = np.zeros((ncls, 4), np.int64)
    np.add.at(sums, labels, boxes)
    counts = np.bincount(labels, minlength=ncls).astype(np.int32)
    cls_level = np.zeros(ncls, np.int64)
    cls_weight = np.full(ncls, np.finfo(np.float64).tiny)
    # the level-fill loop is guarded on BOTH inputs being non-empty
    # (tempcv.cpp:176: ``weights && !weights->empty() &&
    # !levelWeights->empty()``); with empty levels — the scale-cascade
    # driver never fills them (only the ScaleImage invoker does,
    # tempcv.cpp:1084-1095) — every class keeps level 0 and the
    # ``n1 <= groupThreshold`` keep-test below drops everything
    if len(reject_levels) and len(level_weights):
        for i, cls in enumerate(labels):
            if reject_levels[i] > cls_level[cls]:
                cls_level[cls] = reject_levels[i]
                cls_weight[cls] = level_weights[i]
            elif reject_levels[i] == cls_level[cls] \
                    and level_weights[i] > cls_weight[cls]:
                cls_weight[cls] = level_weights[i]
    s = (np.float32(1.0) / counts.astype(np.float32))[:, None]
    rrects = (sums.astype(np.float32) * s).astype(np.int64)

    out_b, out_l, out_w = [], [], []
    for i in range(ncls):
        r1 = rrects[i]
        n1 = int(cls_level[i])
        if n1 <= group_threshold:
            continue
        contained = False
        for j in range(ncls):
            n2 = int(counts[j])
            if j == i or n2 <= group_threshold:
                continue
            r2 = rrects[j]
            dx = int(r2[2] * eps)
            dy = int(r2[3] * eps)
            if (r1[0] >= r2[0] - dx and r1[1] >= r2[1] - dy
                    and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                    and r1[1] + r1[3] <= r2[1] + r2[3] + dy
                    and (n2 > max(3, n1) or n1 < 3)):
                contained = True
                break
        if not contained:
            out_b.append(r1)
            out_l.append(n1)
            out_w.append(float(cls_weight[i]))
    if not out_b:
        return (np.zeros((0, 4), np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float64))
    return (np.stack(out_b).astype(np.int32),
            np.asarray(out_l, np.int32), np.asarray(out_w, np.float64))
