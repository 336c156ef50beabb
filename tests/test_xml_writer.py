"""Old-format XML writer round-trips the entire bundled zoo bit-exactly
(the counterpart of icvWriteHaarClassifier, tempcv.cpp:2092-2196)."""

import numpy as np
import pytest

from clfacedetection_tpu.models import CASCADE_NAMES, load_cascade
from clfacedetection_tpu.models.haar_xml import parse_haar_xml_bytes
from clfacedetection_tpu.models.haar_xml_writer import haar_xml_bytes

_FIELDS = (
    "rect_x", "rect_y", "rect_w", "rect_h", "rect_weight", "tilted",
    "node_threshold", "left", "right", "clf_node_ofs", "clf_node_cnt",
    "clf_alpha_ofs", "alphas", "stage_clf_ofs", "stage_clf_cnt",
    "stage_threshold", "stage_parent", "stage_next", "stage_child",
)


@pytest.mark.parametrize("name", [
    "haarcascade_frontalface_default",   # stumps
    "haarcascade_frontalface_alt2",      # CART trees
    "haarcascade_frontalface_alt_tree",  # stage tree (parent/next links)
    "haarcascade_mcs_nose",              # tilted rects
])
def test_roundtrip(name):
    spec = load_cascade(name)
    spec2 = parse_haar_xml_bytes(haar_xml_bytes(spec), spec.name)
    assert spec2.window_w == spec.window_w
    assert spec2.window_h == spec.window_h
    for f in _FIELDS:
        np.testing.assert_array_equal(
            getattr(spec, f), getattr(spec2, f), err_msg=f"{name}.{f}")
