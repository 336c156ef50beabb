"""Legacy haartraining text-format round-trip
(icvLoadCascadeCART / cvLoadHaarClassifierCascade, tempcv.cpp:1520-1699)."""

import os

import numpy as np
import pytest

from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.models.cart_text import (
    cart_text_stages, load_cascade_directory, parse_cart_text)

_FIELDS = (
    "rect_x", "rect_y", "rect_w", "rect_h", "rect_weight", "tilted",
    "node_threshold", "left", "right", "clf_node_ofs", "clf_node_cnt",
    "clf_alpha_ofs", "alphas", "stage_clf_ofs", "stage_clf_cnt",
    "stage_threshold", "stage_parent", "stage_next", "stage_child",
)


@pytest.mark.parametrize("name", [
    "haarcascade_frontalface_default",   # stumps
    "haarcascade_frontalface_alt2",      # CART trees
    "haarcascade_mcs_nose",              # tilted rects
    "haarcascade_frontalface_alt_tree",  # parent/next links
])
def test_roundtrip(name):
    spec = load_cascade(name)
    stages = cart_text_stages(spec)
    spec2 = parse_cart_text(stages, (spec.window_w, spec.window_h),
                            name=spec.name)
    for f in _FIELDS:
        np.testing.assert_array_equal(getattr(spec, f), getattr(spec2, f),
                                      err_msg=f"{name}.{f}")


def test_default_tree_links():
    """Without trailing parent/next tokens: parent = i-1, next = -1
    (tempcv.cpp:1612-1617)."""
    spec = load_cascade("haarcascade_frontalface_default")
    stages = cart_text_stages(spec)
    stripped = [" ".join(s.split()[:-2]) for s in stages]
    spec2 = parse_cart_text(stripped, (24, 24))
    np.testing.assert_array_equal(
        spec2.stage_parent, np.arange(spec.n_stages) - 1)
    assert np.all(spec2.stage_next == -1)


def test_directory_loader(tmp_path):
    spec = load_cascade("haarcascade_frontalface_default")
    for i, text in enumerate(cart_text_stages(spec)[:5]):
        d = tmp_path / str(i)
        d.mkdir()
        (d / "AdaBoostCARTHaarClassifier.txt").write_text(text)
    spec2 = load_cascade_directory(str(tmp_path), (24, 24))
    assert spec2.n_stages == 5
    np.testing.assert_array_equal(
        spec2.stage_threshold, spec.stage_threshold[:5])
