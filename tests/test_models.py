"""Cascade model layer tests.

Oracle: the measured inventory of the 19 bundled models from the structural
survey (SURVEY.md section 2.2 R3 — stages / weak-classifier nodes / tilted
nodes / base window), plus OpenCV's own new-format cascades when cv2 is
available.
"""

import io

import numpy as np
import pytest

from clfacedetection_tpu.models import (
    CASCADE_NAMES, CascadeSpec, load_cascade, parse_haar_xml,
)

# name -> (stages, nodes, tilted_nodes, (win_w, win_h), stump, tree)
INVENTORY = {
    "haarcascade_frontalface_default": (25, 2913, 0, (24, 24), True, False),
    "haarcascade_frontalface_alt": (22, 2135, 0, (20, 20), True, False),
    "haarcascade_frontalface_alt2": (20, 2094, 0, (20, 20), False, False),
    "haarcascade_frontalface_alt_tree": (47, 8468, 0, (20, 20), True, True),
    "haarcascade_profileface": (26, 2609, 0, (20, 20), True, False),
    "haarcascade_eye": (24, 1066, 0, (20, 20), True, False),
    "haarcascade_eye_tree_eyeglasses": (30, 2553, 577, (20, 20), False, False),
    "haarcascade_lefteye_2splits": (20, 732, 185, (20, 20), False, False),
    "haarcascade_righteye_2splits": (20, 736, 186, (20, 20), False, False),
    "haarcascade_mcs_lefteye": (14, 1648, 346, (18, 12), True, False),
    "haarcascade_mcs_righteye": (18, 2942, 672, (18, 12), True, False),
    "haarcascade_mcs_eyepair_big": (19, 748, 135, (45, 11), True, False),
    "haarcascade_mcs_eyepair_small": (17, 860, 76, (22, 5), True, False),
    "haarcascade_mcs_nose": (20, 3365, 990, (18, 15), True, False),
    "haarcascade_mcs_mouth": (17, 1515, 223, (25, 15), True, False),
    "haarcascade_mcs_upperbody": (19, 3224, 657, (22, 20), True, False),
    "haarcascade_upperbody": (30, 2423, 474, (22, 18), True, False),
    "haarcascade_fullbody": (30, 1464, 201, (14, 28), True, False),
    "haarcascade_lowerbody": (27, 1221, 110, (19, 23), True, False),
}


@pytest.mark.parametrize("name", CASCADE_NAMES)
def test_inventory(name):
    spec = load_cascade(name)
    stages, nodes, tilted, (ww, wh), stump, tree = INVENTORY[name]
    assert spec.n_stages == stages
    assert spec.n_nodes == nodes
    assert spec.n_tilted_nodes == tilted
    assert (spec.window_w, spec.window_h) == (ww, wh)
    assert spec.is_stump_based == stump
    assert spec.is_tree == tree
    spec.validate()


def test_frontalface_default_details():
    spec = load_cascade("haarcascade_frontalface_default")
    # pure stumps: every classifier has one node, two alphas
    assert np.all(spec.clf_node_cnt == 1)
    # max 211 stumps in one stage (drives the reference's
    # MAX_STAGE_CLASSIFIER_COUNT=220, clod.cpp:13)
    assert spec.max_stage_classifiers == 211
    # stump leaf encoding: left=0 -> alpha[0], right=-1 -> alpha[1]
    assert np.all(spec.left == 0)
    assert np.all(spec.right == -1)
    # linear stage chain
    assert np.array_equal(spec.stage_parent, np.arange(25) - 1)
    assert np.all(spec.stage_next == -1)


def test_alt_tree_stage_links():
    spec = load_cascade("haarcascade_frontalface_alt_tree")
    assert spec.is_tree
    # exactly one stage has a real `next` link (SURVEY 2.2 R3: one <next>6</next>)
    assert int(np.sum(spec.stage_next != -1)) == 1
    # child links must point at a stage whose parent is the linker
    for i, c in enumerate(spec.stage_child):
        if c != -1:
            assert spec.stage_parent[c] == i


def test_cart_tree_links_alt2():
    spec = load_cascade("haarcascade_frontalface_alt2")
    assert not spec.is_stump_based
    multi = spec.clf_node_cnt[spec.clf_node_cnt > 1]
    assert multi.size > 0
    # alpha count per classifier is node count + 1
    total_alpha = int(np.sum(spec.clf_node_cnt + 1))
    assert spec.alphas.shape[0] == total_alpha


def test_rect_weights_layout():
    spec = load_cascade("haarcascade_frontalface_alt")
    # first two rects always present, third optional (clod.cl guards rect 3
    # by weight != 0, clod.cl:63-66)
    assert np.all(spec.rect_weight[:, 0] != 0)
    assert np.all(spec.rect_weight[:, 1] != 0)
    absent = spec.rect_weight[:, 2] == 0
    assert np.all(spec.rect_w[absent, 2] == 0)


def test_roundtrip_npz():
    spec = load_cascade("haarcascade_eye")
    blob = spec.to_bytes()
    spec2 = CascadeSpec.from_bytes(blob)
    assert spec2.name == spec.name
    for f in ("rect_x", "rect_weight", "node_threshold", "alphas",
              "stage_threshold", "left", "right", "stage_child"):
        np.testing.assert_array_equal(getattr(spec, f), getattr(spec2, f))


def test_new_format_parse():
    cv2 = pytest.importorskip("cv2")
    import os
    path = os.path.join(cv2.data.haarcascades,
                        "haarcascade_frontalface_default.xml")
    if not os.path.exists(path):
        pytest.skip("cv2 build ships no cascade XML data")
    spec = parse_haar_xml(path, name="ff_default_newformat")
    # the new-format conversion of the same model keeps the same geometry
    old = load_cascade("haarcascade_frontalface_default")
    assert (spec.window_w, spec.window_h) == (old.window_w, old.window_h)
    assert spec.n_stages == old.n_stages
    assert spec.n_nodes == old.n_nodes
