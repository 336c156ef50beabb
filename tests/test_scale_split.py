"""Scale-split execution of the scale-cascade detector: the per-scale
shared-program dispatches round-robin over devices (SURVEY.md section
2.3 "splitting pyramid scales across devices") and must be box-for-box
identical to the single-device path."""

import numpy as np
import pytest

import jax

from clfacedetection_tpu.detect import ScaleCascadeDetector
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_scale_split_matches_single():
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=44.0, seed=2)
    ref, ref_ovf = ScaleCascadeDetector(
        spec, (96, 128), max_stages=8).candidates(frame)
    det = ScaleCascadeDetector(spec, (96, 128), max_stages=8)
    det.shard_scales(jax.devices()[:8])
    got, ovf = det.candidates(frame)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    assert ovf == ref_ovf


def test_scale_split_fbo_still_single_device():
    """find_biggest_object keeps default-device placement after
    shard_scales (its planes are not broadcast; mixed-device operands
    would fail the dispatch)."""
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=50.0, seed=6)
    ref = ScaleCascadeDetector(spec, (96, 128), max_stages=6) \
        .find_biggest_object(frame, min_neighbors=1)
    det = ScaleCascadeDetector(spec, (96, 128), max_stages=6)
    det.shard_scales(jax.devices()[:8])
    got = det.find_biggest_object(frame, min_neighbors=1)
    assert np.array_equal(got, ref)


@pytest.mark.exhaustive
def test_scale_split_grouped_detection():
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=50.0, seed=4)
    ref = ScaleCascadeDetector(spec, (96, 128),
                               max_stages=10).detect(frame, 1)
    det = ScaleCascadeDetector(spec, (96, 128), max_stages=10)
    det.shard_scales(jax.devices()[:4])
    got = det.detect(frame, 1)
    assert np.array_equal(got.boxes, ref.boxes)
    assert np.array_equal(got.candidates, ref.candidates)
