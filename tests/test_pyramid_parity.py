"""Scale-image (pyramid) path parity vs the golden oracle.

PyramidDetector is the TPU performance path (packed canvas, static
stencils, MXU patch-matmul tail); in float64 it must reproduce the golden
scale-image semantics box-for-box, including the pinned fixed-point
resize, the (1,1,w0-2,h0-2) normalization rect, the ystep-2/1 static
visit lattice and its one-row/col-short strip bounds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.detect import (
    PyramidDetector, detect_multi_scale_reference)
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face


@pytest.fixture(scope="module")
def image():
    return synth_face((120, 160))


CASES = [
    ("haarcascade_frontalface_default", 4),   # stumps, 24x24 window
    ("haarcascade_frontalface_alt2", 4),      # CART depth-2 trees
    ("haarcascade_mcs_nose", 4),              # tilted features
    pytest.param("haarcascade_frontalface_alt_tree", 5, marks=pytest.mark.slow),  # stage tree
]


@pytest.mark.parametrize("name,max_stages", CASES)
def test_pyramid_candidate_parity(image, name, max_stages):
    spec = load_cascade(name)
    gold = detect_multi_scale_reference(
        image, spec, min_neighbors=0, max_stages=max_stages,
        mode="scale_image")
    det = PyramidDetector(spec, image.shape, max_stages=max_stages,
                          dtype=jnp.float64)
    cand, overflow = det.candidates(image)
    assert not overflow
    gs = set(map(tuple, np.asarray(gold)))
    js = set(map(tuple, cand))
    assert len(gs) > 0
    assert gs == js, (f"{name}: {len(gs - js)} golden-only, "
                      f"{len(js - gs)} jax-only")


def test_pyramid_full_cascade(image):
    spec = load_cascade("haarcascade_frontalface_default")
    gold = detect_multi_scale_reference(image, spec, min_neighbors=0,
                                        mode="scale_image")
    det = PyramidDetector(spec, image.shape, dtype=jnp.float64)
    cand, overflow = det.candidates(image)
    assert not overflow
    assert len(gold) > 0
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, cand))


def test_pyramid_grouped(image):
    spec = load_cascade("haarcascade_frontalface_alt")
    gold = detect_multi_scale_reference(image, spec, min_neighbors=2,
                                        max_stages=5, mode="scale_image")
    det = PyramidDetector(spec, image.shape, max_stages=5,
                          dtype=jnp.float64)
    res = det.detect(image, min_neighbors=2)
    assert set(map(tuple, np.asarray(gold))) == set(map(tuple, res.boxes))


def test_pyramid_f32_close(image):
    spec = load_cascade("haarcascade_frontalface_default")
    d64 = PyramidDetector(spec, image.shape, max_stages=4,
                          dtype=jnp.float64)
    d32 = PyramidDetector(spec, image.shape, max_stages=4,
                          dtype=jnp.float32)
    c64 = set(map(tuple, d64.candidates(image)[0]))
    c32 = set(map(tuple, d32.candidates(image)[0]))
    jac = len(c64 & c32) / max(len(c64 | c32), 1)
    assert jac > 0.98, f"f32/f64 Jaccard {jac:.4f}"
