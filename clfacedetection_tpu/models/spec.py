"""Cascade model data structures.

A ``CascadeSpec`` is the in-memory, framework-neutral representation of an
OpenCV Haar classifier cascade, flattened into structure-of-arrays (SoA) form
so it can be (a) serialized to a compact ``.npz`` artifact and (b) compiled
into device-resident tables for the TPU evaluator.

Semantics mirror the reference's model layer (the ``CvHaarClassifierCascade``
tree of stages -> classifiers (trees) -> nodes with 2-3 weighted rects; see
reference ``tempcv.hpp:103-112`` and the XML reader ``tempcv.cpp:1749-2089``):

* Each *node* has a Haar feature (up to 3 weighted axis-aligned or 45-degree
  tilted rectangles), a threshold, and ``left``/``right`` links. A link that
  is ``> 0`` points at another node of the same classifier (CART tree); a
  link ``<= 0`` is a leaf and indexes the classifier's alpha array as
  ``alpha[-link]`` (cf. ``tempcv.cpp:771-792``).
* Each *classifier* owns ``count`` nodes and ``count + 1`` alphas, assembled
  in leaf-appearance order (left before right, nodes in order; cf.
  ``tempcv.cpp:1985-2035``).
* Each *stage* has a passing threshold and optional ``parent``/``next``
  links forming a stage *tree* (``haarcascade_frontalface_alt_tree``);
  ``child`` is the first stage whose parent is this stage
  (cf. ``tempcv.cpp:2056-2082``).

Derived flags replicate ``icvCreateHidHaarClassifierCascade``
(``tempcv.cpp:407-465``): ``is_stump_based`` (every classifier has exactly
one node), ``has_tilted`` and ``is_tree`` (any stage with ``next != -1``).
"""

from __future__ import annotations

import dataclasses
import io
from typing import BinaryIO, Union

import numpy as np

# A Haar feature holds at most 3 weighted rectangles
# (reference MAX_FEATURE_RECT_COUNT, clod.cpp:12 / CV_HAAR_FEATURE_MAX).
MAX_RECTS = 3

_ARRAY_FIELDS = (
    "rect_x", "rect_y", "rect_w", "rect_h", "rect_weight", "tilted",
    "node_threshold", "left", "right",
    "clf_node_ofs", "clf_node_cnt", "clf_alpha_ofs", "alphas",
    "stage_clf_ofs", "stage_clf_cnt", "stage_threshold",
    "stage_parent", "stage_next", "stage_child",
)


@dataclasses.dataclass
class CascadeSpec:
    """Flattened (SoA) Haar cascade."""

    name: str
    window_w: int
    window_h: int

    # -- nodes (flattened over all stages/classifiers, in cascade order) ----
    rect_x: np.ndarray       # int16 [n_nodes, 3]
    rect_y: np.ndarray       # int16 [n_nodes, 3]
    rect_w: np.ndarray       # int16 [n_nodes, 3]  (0 => rect absent)
    rect_h: np.ndarray       # int16 [n_nodes, 3]
    rect_weight: np.ndarray  # float32 [n_nodes, 3] (0.0 => rect absent)
    tilted: np.ndarray       # bool [n_nodes]
    node_threshold: np.ndarray  # float32 [n_nodes]
    left: np.ndarray         # int32 [n_nodes] (>0 node index, <=0 leaf alpha)
    right: np.ndarray        # int32 [n_nodes]

    # -- classifiers (weak classifiers / trees) -----------------------------
    clf_node_ofs: np.ndarray   # int32 [n_clf] offset into node arrays
    clf_node_cnt: np.ndarray   # int32 [n_clf]
    clf_alpha_ofs: np.ndarray  # int32 [n_clf] offset into alphas
    alphas: np.ndarray         # float32 [sum(clf_node_cnt + 1)]

    # -- stages --------------------------------------------------------------
    stage_clf_ofs: np.ndarray    # int32 [n_stages] offset into classifier arrays
    stage_clf_cnt: np.ndarray    # int32 [n_stages]
    stage_threshold: np.ndarray  # float32 [n_stages] (raw, unbiased)
    stage_parent: np.ndarray     # int32 [n_stages] (-1 = none)
    stage_next: np.ndarray       # int32 [n_stages] (-1 = none)
    stage_child: np.ndarray      # int32 [n_stages] (-1 = none)

    # ------------------------------------------------------------------ props
    @property
    def n_stages(self) -> int:
        return int(self.stage_clf_cnt.shape[0])

    @property
    def n_classifiers(self) -> int:
        return int(self.clf_node_cnt.shape[0])

    @property
    def n_nodes(self) -> int:
        return int(self.node_threshold.shape[0])

    @property
    def is_stump_based(self) -> bool:
        """True iff every classifier is a single-node stump (tempcv.cpp:465)."""
        return bool(np.all(self.clf_node_cnt == 1))

    @property
    def has_tilted(self) -> bool:
        return bool(np.any(self.tilted))

    @property
    def is_tree(self) -> bool:
        """True iff any stage has a ``next`` link (tempcv.cpp:431)."""
        return bool(np.any(self.stage_next != -1))

    @property
    def n_tilted_nodes(self) -> int:
        return int(np.count_nonzero(self.tilted))

    @property
    def max_stage_classifiers(self) -> int:
        return int(self.stage_clf_cnt.max())

    # ----------------------------------------------------------------- utils
    def stage_nodes(self, stage: int) -> np.ndarray:
        """Node indices belonging to ``stage`` (all its classifiers' nodes)."""
        c0 = int(self.stage_clf_ofs[stage])
        c1 = c0 + int(self.stage_clf_cnt[stage])
        out = []
        for c in range(c0, c1):
            n0 = int(self.clf_node_ofs[c])
            out.extend(range(n0, n0 + int(self.clf_node_cnt[c])))
        return np.asarray(out, dtype=np.int32)

    def validate(self) -> None:
        """Structural invariants (mirrors icvCreateHidHaarClassifierCascade's
        input validation, tempcv.cpp:340-390)."""
        n_nodes, n_clf, n_stages = self.n_nodes, self.n_classifiers, self.n_stages
        assert self.rect_x.shape == (n_nodes, MAX_RECTS)
        assert self.rect_weight.shape == (n_nodes, MAX_RECTS)
        assert self.clf_node_ofs.shape == (n_clf,)
        assert self.stage_clf_ofs.shape == (n_stages,)
        # every rect inside the base window
        present = self.rect_weight != 0
        x, y = self.rect_x, self.rect_y
        w, h = self.rect_w, self.rect_h
        t = self.tilted[:, None]
        ww, wh = self.window_w, self.window_h
        ok_common = (w >= 0) & (h >= 0) & (y >= 0) & (x + w <= ww)
        ok_upright = (x >= 0) & (y + h <= wh)
        ok_tilted = (x - h >= 0) & (y + w + h <= wh)
        ok = ok_common & np.where(t, ok_tilted, ok_upright)
        if not bool(np.all(ok[present])):
            bad = np.argwhere(~ok & present)
            raise ValueError(f"{self.name}: rect(s) outside base window: {bad[:5]}")
        # leaf links address valid alphas
        for c in range(n_clf):
            cnt = int(self.clf_node_cnt[c])
            n0 = int(self.clf_node_ofs[c])
            for k in range(cnt):
                for link in (int(self.left[n0 + k]), int(self.right[n0 + k])):
                    if link > 0:
                        if not (k < link < cnt):
                            raise ValueError(
                                f"{self.name}: clf {c} node {k} bad link {link}")
                    else:
                        if not (0 <= -link <= cnt):
                            raise ValueError(
                                f"{self.name}: clf {c} node {k} bad leaf {link}")

    # ------------------------------------------------------------ serialization
    def save(self, path_or_file: Union[str, BinaryIO]) -> None:
        """Serialize to a compressed ``.npz`` artifact (the framework's native
        model format; replaces the reference's XML-at-runtime loading,
        cf. main.cpp:36)."""
        arrays = {f: getattr(self, f) for f in _ARRAY_FIELDS}
        arrays["__meta_name"] = np.array(self.name)
        arrays["__meta_window"] = np.array([self.window_w, self.window_h],
                                           dtype=np.int32)
        np.savez_compressed(path_or_file, **arrays)

    @classmethod
    def load(cls, path_or_file: Union[str, BinaryIO]) -> "CascadeSpec":
        with np.load(path_or_file, allow_pickle=False) as z:
            kwargs = {f: z[f] for f in _ARRAY_FIELDS}
            name = str(z["__meta_name"])
            ww, wh = (int(v) for v in z["__meta_window"])
        return cls(name=name, window_w=ww, window_h=wh, **kwargs)

    def clone(self) -> "CascadeSpec":
        """Deep copy (the icvCloneHaarClassifier analog, tempcv.cpp:2198)."""
        kwargs = {f: getattr(self, f).copy() for f in _ARRAY_FIELDS}
        return CascadeSpec(name=self.name, window_w=self.window_w,
                           window_h=self.window_h, **kwargs)

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        self.save(buf)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CascadeSpec":
        return cls.load(io.BytesIO(data))
