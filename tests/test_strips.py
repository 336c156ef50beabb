"""Row-strip intra-frame sharding (parallel/strips.py) on the virtual
8-CPU mesh: the TPU analog of the reference CPU baseline's TBB strip
parallelism (cv::parallel_for over window-row ranges,
tempcv.cpp:1305-1311).  The sharded program must be box-for-box AND
order-identical to the single-device detector."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from clfacedetection_tpu.detect import PyramidDetector
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.parallel import StripShardedPyramidDetector
from clfacedetection_tpu.utils import synth_face, synth_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _mesh(k):
    return Mesh(np.array(jax.devices()[:k]), ("strips",))


def test_strips_match_single_truncated():
    """Fast lane: truncated cascade, small frame, 8 strips."""
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=40.0, seed=3)
    det = PyramidDetector(spec, (96, 128), max_stages=6, cap=256)
    ref, ref_ovf = det.candidates(frame)
    sdet = StripShardedPyramidDetector(det, _mesh(8))
    got, ovf = sdet.candidates(frame)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    assert ovf == ref_ovf


def test_strips_mesh4_tilted():
    """Tilted cascade (second RSAT plane through the strip slices)."""
    spec = load_cascade("haarcascade_mcs_nose")
    frame = synth_face((80, 96), size=36.0, seed=11)
    det = PyramidDetector(spec, (80, 96), max_stages=4, cap=256)
    ref, _ = det.candidates(frame)
    sdet = StripShardedPyramidDetector(det, _mesh(4))
    got, _ = sdet.candidates(frame)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_strips_overflow_regrow():
    """A strip overflowing its cap/k slice regrows like the
    single-device path and converges to equality."""
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=40.0, seed=5)
    det = PyramidDetector(spec, (96, 128), max_stages=2, cap=64)
    ref_det = PyramidDetector(spec, (96, 128), max_stages=2)
    ref, _ = ref_det.candidates(frame)
    sdet = StripShardedPyramidDetector(det, _mesh(8))
    got, ovf = sdet.candidates(frame)
    assert not ovf
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.exhaustive
def test_strips_full_depth_vga():
    """Full-depth frontalface_alt at VGA over 8 strips == single-device,
    on a synthetic scene with real detections."""
    spec = load_cascade("haarcascade_frontalface_alt")
    frame = synth_scene((480, 640),
                        faces=((240, 200, 110.0), (220, 460, 80.0)),
                        seed=9)
    det = PyramidDetector(spec, (480, 640), min_size=(40, 40))
    ref, _ = det.candidates(frame)
    assert len(ref) > 0
    sdet = StripShardedPyramidDetector(det, _mesh(8))
    got, _ = sdet.candidates(frame)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
