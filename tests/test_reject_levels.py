"""ROC / reject-levels output parity (tempcv.cpp:1084-1095 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.detect import (
    PyramidDetector, detect_multi_scale_reference)
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face


def test_reject_levels_parity():
    img = synth_face((120, 160))
    spec = load_cascade("haarcascade_frontalface_default")
    gb, gl, gw = detect_multi_scale_reference(
        img, spec, min_neighbors=0, mode="scale_image",
        output_reject_levels=True)
    det = PyramidDetector(spec, img.shape, dtype=jnp.float64,
                          output_levels=True)
    jb, jl, jw, overflow = det.candidates_with_levels(img)
    assert not overflow
    assert len(gb) > 0
    gset = {tuple(b) + (int(l),) for b, l in zip(gb.tolist(), gl)}
    jset = {tuple(b) + (int(l),) for b, l in zip(jb.tolist(), jl)}
    assert gset == jset
    gd = {tuple(b): w for b, w in zip(gb.tolist(), gw)}
    jd = {tuple(b): w for b, w in zip(jb.tolist(), jw)}
    for k in gd:
        assert abs(gd[k] - jd[k]) < 1e-9


@pytest.mark.slow
def test_reject_levels_grouped():
    img = synth_face((120, 160))
    spec = load_cascade("haarcascade_frontalface_default")
    gb, gl, gw = detect_multi_scale_reference(
        img, spec, min_neighbors=2, mode="scale_image",
        output_reject_levels=True)
    from clfacedetection_tpu.detect.grouping import group_rectangles_levels
    det = PyramidDetector(spec, img.shape, dtype=jnp.float64,
                          output_levels=True)
    jb0, jl0, jw0, _ = det.candidates_with_levels(img)
    jb, jl, jw = group_rectangles_levels(jb0, jl0, jw0, 2, eps=0.2)
    assert {tuple(b) for b in gb.tolist()} == {tuple(b) for b in jb.tolist()}

def test_reject_levels_scale_cascade_degenerate():
    """Scale-cascade ROC is faithfully degenerate: the invoker never fills
    the level vectors (tempcv.cpp:1155-1158), so grouping with
    min_neighbors>0 drops everything and min_neighbors=0 returns boxes
    with empty level arrays (tempcv.cpp:1466-1469 + guard at 176)."""
    img = synth_face((120, 160))
    spec = load_cascade("haarcascade_frontalface_default")
    # oracle
    gb, gl, gw = detect_multi_scale_reference(
        img, spec, min_neighbors=0, mode="scale_cascade",
        output_reject_levels=True, max_stages=6)
    assert len(gb) > 0 and len(gl) == 0 and len(gw) == 0
    gb2, gl2, gw2 = detect_multi_scale_reference(
        img, spec, min_neighbors=2, mode="scale_cascade",
        output_reject_levels=True, max_stages=6)
    assert len(gb2) == 0 and len(gl2) == 0
    # API path (scale-cascade detector on the default backend)
    from clfacedetection_tpu.api import CascadeClassifier
    clf = CascadeClassifier(spec, mode="scale_cascade")
    jb, jl, jw = clf.detect_multi_scale3(img, min_neighbors=0,
                                         max_stages=6)
    assert {tuple(b) for b in jb.tolist()} == {tuple(b) for b in gb.tolist()}
    assert len(jl) == 0 and len(jw) == 0
    jb2, jl2, jw2 = clf.detect_multi_scale3(img, min_neighbors=2,
                                            max_stages=6)
    assert len(jb2) == 0 and len(jl2) == 0


@pytest.mark.slow
def test_reject_levels_stage_tree():
    """Stage-tree ROC: only accepted windows are reported, at level
    n_stages with the accepting leaf's stage sum (tempcv.cpp:834-861 +
    1084-1088)."""
    img = synth_face((120, 160))
    spec = load_cascade("haarcascade_frontalface_alt_tree")
    gb, gl, gw = detect_multi_scale_reference(
        img, spec, min_neighbors=0, mode="scale_image",
        output_reject_levels=True, max_stages=7)
    det = PyramidDetector(spec, img.shape, dtype=jnp.float64,
                          output_levels=True, max_stages=7)
    jb, jl, jw, overflow = det.candidates_with_levels(img)
    assert not overflow
    assert len(gb) > 0
    gset = {tuple(b) + (int(l),) for b, l in zip(gb.tolist(), gl)}
    jset = {tuple(b) + (int(l),) for b, l in zip(jb.tolist(), jl)}
    assert gset == jset
    gd = {tuple(b): w for b, w in zip(gb.tolist(), gw)}
    jd = {tuple(b): w for b, w in zip(jb.tolist(), jw)}
    for k in gd:
        assert abs(gd[k] - jd[k]) < 1e-9
