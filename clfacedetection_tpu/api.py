"""Public detection API.

Two surfaces, mirroring the reference's two API layers:

* ``CascadeClassifier`` — the OpenCV-style object API
  (``cvHaarDetectObjects`` parameter surface: scaleFactor, minNeighbors,
  flags, minSize, maxSize; tempcv.hpp:141-154).
* ``detect_objects`` — the reference's own C API
  (``clodDetectObjects(image, cascade, data, min_window_size,
  max_window_size, min_neighbors, flags, use_opencl)`` -> matches+count,
  clod.h:61-81), with the ``clod_flags`` execution-strategy bitmask
  (clod.h:17-21) mapped onto this framework's execution knobs.

Unlike the reference, which hardcodes paths and rebuilds device state per
call (main.cpp:10,36; clod.cpp:1176-1338), detectors here are compiled
per (cascade, image-shape, parameter) signature and cached, so steady-state
calls are a single device dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .detect.detector import DetectionResult, ScaleCascadeDetector
from .detect.pyramid import PyramidDetector
from .models.spec import CascadeSpec
from .models.zoo import load_cascade
from .ops.integral import bgr_to_gray

__all__ = [
    "CascadeClassifier", "detect_objects", "WeightedRect",
    "CLOD_PRECOMPUTE_FEATURES", "CLOD_BLOCK_IMPLEMENTATION",
    "CLOD_PER_STAGE_ITERATIONS",
]

# clod_flags (clod.h:17-21; NB the reference defines them as 2<<n).
CLOD_PRECOMPUTE_FEATURES = 2 << 0
CLOD_BLOCK_IMPLEMENTATION = 2 << 1
CLOD_PER_STAGE_ITERATIONS = 2 << 2

# OpenCV haar flags (tempcv.hpp:127-130)
CV_HAAR_DO_CANNY_PRUNING = 1
CV_HAAR_SCALE_IMAGE = 2
CV_HAAR_FIND_BIGGEST_OBJECT = 4
CV_HAAR_DO_ROUGH_SEARCH = 8


@dataclasses.dataclass(frozen=True)
class WeightedRect:
    """CLODWeightedRect (clod.h:39-47)."""

    x: int
    y: int
    width: int
    height: int
    weight: int  # neighbor count after grouping (0 if ungrouped)


def _to_gray(image: np.ndarray) -> np.ndarray:
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[-1] == 3:
        return np.asarray(bgr_to_gray(jnp.asarray(image)))
    if image.ndim == 3 and image.shape[-1] == 4:
        from .ops.integral import bgra_to_gray
        return np.asarray(bgra_to_gray(jnp.asarray(image)))
    if image.ndim == 2:
        return image.astype(np.uint8, copy=False)
    raise ValueError(f"expected (H, W) gray, (H, W, 3) BGR or (H, W, 4) "
                     f"BGRA, got {image.shape}")


class CascadeClassifier:
    """OpenCV-compatible multi-scale detector over one cascade model.

    >>> clf = CascadeClassifier("haarcascade_frontalface_alt")
    >>> boxes = clf.detect_multi_scale(frame, scale_factor=1.1,
    ...                                min_neighbors=3, min_size=(40, 40))

    ``mode`` selects the pyramid strategy, mirroring the reference's
    CV_HAAR_SCALE_IMAGE flag (tempcv.cpp:1257):

    * ``"scale_image"`` (default) — downscale the frame per level, fixed
      window; the packed-canvas TPU fast path (detect/pyramid.py).
    * ``"scale_cascade"`` — fixed frame, features rescaled per level; the
      mode the reference demo exercises (main.cpp:145, flags=0).
    """

    def __init__(self, cascade: Union[str, CascadeSpec],
                 dtype=jnp.float32, mode: str = "scale_image"):
        self.spec = (cascade if isinstance(cascade, CascadeSpec)
                     else load_cascade(cascade))
        self.dtype = dtype
        if mode not in ("scale_image", "scale_cascade"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self._detectors: Dict[tuple, object] = {}

    @property
    def original_window_size(self) -> Tuple[int, int]:
        return (self.spec.window_w, self.spec.window_h)

    def empty(self) -> bool:
        return self.spec.n_stages == 0

    def _detector(self, shape, scale_factor, min_size, max_size,
                  mode=None, **knobs):
        mode = mode or self.mode
        key = (mode, shape, float(scale_factor), tuple(min_size),
               tuple(max_size) if max_size else None,
               tuple(sorted(knobs.items())))
        det = self._detectors.get(key)
        if det is None:
            cls = (PyramidDetector if mode == "scale_image"
                   else ScaleCascadeDetector)
            det = cls(
                self.spec, shape, scale_factor=scale_factor,
                min_size=tuple(min_size),
                max_size=tuple(max_size) if max_size else None,
                dtype=self.dtype, **knobs)
            self._detectors[key] = det
        return det

    def detect_multi_scale(self, image,
                           scale_factor: float = 1.1,
                           min_neighbors: int = 3,
                           flags: int = 0,
                           min_size: Tuple[int, int] = (0, 0),
                           max_size: Optional[Tuple[int, int]] = None,
                           **knobs) -> np.ndarray:
        """Detect objects; returns int32 boxes [n, 4] as (x, y, w, h)."""
        res = self.detect_multi_scale_full(
            image, scale_factor, min_neighbors, flags, min_size, max_size,
            **knobs)
        return res.boxes

    def detect_multi_scale2(self, image,
                            scale_factor: float = 1.1,
                            min_neighbors: int = 3,
                            flags: int = 0,
                            min_size: Tuple[int, int] = (0, 0),
                            max_size: Optional[Tuple[int, int]] = None,
                            **knobs):
        """cv2's detectMultiScale2 overload: returns (boxes,
        num_detections), where num_detections[i] is the neighbor count
        of grouped box i (the rweights output of groupRectangles —
        cf. the reference grouping's class counts, tempcv.cpp:236-258)."""
        res = self.detect_multi_scale_full(
            image, scale_factor, min_neighbors, flags, min_size, max_size,
            **knobs)
        return res.boxes, res.neighbors

    def detect_multi_scale3(self, image,
                            scale_factor: float = 1.1,
                            min_neighbors: int = 3,
                            min_size: Tuple[int, int] = (0, 0),
                            max_size: Optional[Tuple[int, int]] = None,
                            **knobs):
        """ROC variant (cv2's detectMultiScale3 / outputRejectLevels):
        returns (boxes, reject_levels, level_weights).

        Per-window levels exist only in scale-image mode (the reference's
        level collection lives in the ScaleImage invoker,
        tempcv.cpp:1084-1095).  In scale-cascade mode the reference's
        ``cvHaarDetectObjectsForROC`` still accepts outputRejectLevels
        but its invoker never fills the vectors (tempcv.cpp:1155-1158),
        so the levels-overload grouping sees empty levels and —
        faithfully reproduced here — returns no boxes for
        ``min_neighbors > 0`` and boxes with empty level arrays for
        ``min_neighbors == 0`` (tempcv.cpp:1466-1469)."""
        gray = _to_gray(image)
        if self.mode != "scale_image":
            det = self._detector(gray.shape, scale_factor, min_size,
                                 max_size, **knobs)
            boxes, _ = det.candidates(gray)
            levels = np.zeros(0, np.int32)
            weights = np.zeros(0, np.float64)
        else:
            det = self._detector(gray.shape, scale_factor, min_size,
                                 max_size, output_levels=True, **knobs)
            boxes, levels, weights, _ = det.candidates_with_levels(gray)
        if min_neighbors != 0:
            from .detect.grouping import group_rectangles_levels
            return group_rectangles_levels(boxes, levels, weights,
                                           min_neighbors, eps=0.2)
        return boxes, levels, weights

    def detect_multi_scale_full(self, image,
                                scale_factor: float = 1.1,
                                min_neighbors: int = 3,
                                flags: int = 0,
                                min_size: Tuple[int, int] = (0, 0),
                                max_size: Optional[Tuple[int, int]] = None,
                                **knobs) -> DetectionResult:
        gray = _to_gray(image)
        if flags & CV_HAAR_FIND_BIGGEST_OBJECT:
            # the ROI-shrink loop is sequential host logic in the
            # reference too (tempcv.cpp:1349-1454); on TPU the per-scale
            # window sweeps run the compiled device programs with a
            # dynamic scan-ROI (ScaleCascadeDetector.find_biggest_object)
            import jax
            if jax.default_backend() == "tpu" and "device" not in knobs:
                det = self._detector(gray.shape, scale_factor, (0, 0),
                                     max_size, mode="scale_cascade",
                                     **knobs)
                boxes = det.find_biggest_object(
                    gray, min_neighbors=min_neighbors,
                    min_size=tuple(min_size),
                    rough_search=bool(flags & CV_HAAR_DO_ROUGH_SEARCH))
            else:
                from .detect.reference_impl import \
                    detect_multi_scale_reference
                boxes = detect_multi_scale_reference(
                    gray, self.spec, scale_factor=scale_factor,
                    min_neighbors=min_neighbors, min_size=tuple(min_size),
                    find_biggest_object=True,
                    rough_search=bool(flags & CV_HAAR_DO_ROUGH_SEARCH))
            return DetectionResult(
                boxes=boxes, neighbors=np.ones(len(boxes), np.int32),
                candidates=boxes, survivor_overflow=False)
        mode = self.mode
        if flags & CV_HAAR_SCALE_IMAGE:
            mode = "scale_image"
        if flags & CV_HAAR_DO_CANNY_PRUNING and mode == "scale_cascade":
            # canny pruning exists only in the scale-cascade driver
            # (tempcv.cpp:1337-1342)
            knobs = dict(knobs, do_canny_pruning=True)
        det = self._detector(gray.shape, scale_factor, min_size, max_size,
                             mode=mode, **knobs)
        return det.detect(gray, min_neighbors=min_neighbors)


def detect_objects(image,
                   cascade: Union[str, CascadeSpec],
                   min_window_size: Optional[Tuple[int, int]] = None,
                   max_window_size: Optional[Tuple[int, int]] = None,
                   min_neighbors: int = 3,
                   flags: int = (CLOD_PRECOMPUTE_FEATURES
                                 | CLOD_PER_STAGE_ITERATIONS),
                   scale_factor: float = 1.1,
                   use_tpu: bool = True):
    """clodDetectObjects-shaped entry point (clod.h:61-81).

    Returns a list of :class:`WeightedRect` (the CLODDetectObjectsResult
    matches array).  The ``clod_flags`` strategy bits selected between CPU
    evaluation orders in the reference (window-major / stage-major /
    unrolled-block, clod.cpp:1339-1500); each maps to a real TPU
    execution strategy of the survivor tail:

    - ``CLOD_PER_STAGE_ITERATIONS`` -> ``strategy="per_stage"``: the
      stage-grouped in-kernel cascade walk with early exit (the worklist
      / runSubwindow flavor, clod.cpp:1448-1471) and a wider dense front.
    - ``CLOD_BLOCK_IMPLEMENTATION`` (or ``CLOD_PRECOMPUTE_FEATURES``
      alone) -> ``strategy="block"``: one fused all-nodes stencil matmul
      against the precomputed corner-weight matrix (the
      precomputed-features / unrolled-block flavor, clod.cpp:820-1173).
    - neither bit -> ``strategy="direct"``: XLA corner gathers with no
      precomputed stencil kernel (the window-major no-precompute flavor,
      runClassifier clod.cpp:580-634).

    ``use_tpu=False`` runs the NumPy golden implementation — the moral
    equivalent of the reference's ``use_opencl=false`` CPU fallback
    (clif.cpp:247-250, clod.cpp:1339-1500).
    """
    spec = cascade if isinstance(cascade, CascadeSpec) else \
        load_cascade(cascade)
    gray = _to_gray(image)
    min_size = tuple(min_window_size) if min_window_size else (0, 0)

    if not use_tpu:
        from .detect.reference_impl import detect_multi_scale_reference
        boxes = detect_multi_scale_reference(
            gray, spec, scale_factor=scale_factor,
            min_neighbors=min_neighbors, min_size=min_size,
            max_size=max_window_size)
        return [WeightedRect(int(x), int(y), int(w), int(h), 0)
                for x, y, w, h in boxes]

    if flags & CLOD_PER_STAGE_ITERATIONS:
        strategy, front = "per_stage", 4
    elif flags & (CLOD_BLOCK_IMPLEMENTATION | CLOD_PRECOMPUTE_FEATURES):
        strategy, front = "block", 2
    else:
        strategy, front = "direct", 2
    clf = CascadeClassifier(spec)
    res = clf.detect_multi_scale_full(
        gray, scale_factor=scale_factor, min_neighbors=min_neighbors,
        min_size=min_size, max_size=max_window_size, front_stages=front,
        strategy=strategy)
    neigh = res.neighbors if len(res.neighbors) else \
        np.zeros(len(res.boxes), np.int32)
    return [WeightedRect(int(x), int(y), int(w), int(h), int(n))
            for (x, y, w, h), n in zip(res.boxes, neigh)]
