"""Multi-device sharded detection on the virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax

from clfacedetection_tpu.detect import PyramidDetector
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.parallel import detect_sharded, gather_detections
from clfacedetection_tpu.runtime import (
    BatchedPyramidDetector, data_parallel_mesh)
from clfacedetection_tpu.utils import synth_face


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def frames():
    return np.stack([synth_face((96, 128), size=30.0, seed=i)
                     for i in range(8)])


@pytest.mark.slow
def test_batched_matches_single(frames):
    spec = load_cascade("haarcascade_frontalface_default")
    single = PyramidDetector(spec, (96, 128), max_stages=5)
    mesh = data_parallel_mesh(jax.devices()[:8])
    det = BatchedPyramidDetector(spec, (96, 128), 8, mesh=mesh,
                                 max_stages=5)
    batch_res = det.detect(frames, min_neighbors=0)
    for i in range(8):
        ref, _ = single.candidates(frames[i])
        got = batch_res[i].candidates
        assert set(map(tuple, ref)) == set(map(tuple, got)), f"frame {i}"


@pytest.mark.slow
def test_batched_full_depth_matches_single():
    """Full-depth (22-stage, untruncated) frontalface_alt over the
    8-device mesh == the single-device program, box for box.  The
    driver dryrun additionally runs this shape at VGA
    (__graft_entry__.dryrun_multichip); this case keeps a full-depth
    sharded regression inside the suite."""
    spec = load_cascade("haarcascade_frontalface_alt")
    shape = (240, 320)
    full_frames = np.stack([synth_face(shape, size=80.0, seed=i)
                            for i in range(8)])
    single = PyramidDetector(spec, shape, min_size=(40, 40))
    mesh = data_parallel_mesh(jax.devices()[:8])
    det = BatchedPyramidDetector(spec, shape, 8, mesh=mesh,
                                 min_size=(40, 40))
    batch_res = det.detect(full_frames, min_neighbors=0)
    n_total = 0
    for i in range(8):
        ref, _ = single.candidates(full_frames[i])
        got = batch_res[i].candidates
        assert set(map(tuple, ref)) == set(map(tuple, got)), f"frame {i}"
        n_total += len(ref)
    assert n_total > 0


@pytest.mark.exhaustive
def test_shard_map_matches_batched(frames):
    """detect_sharded/gather_detections (parallel.py API) == the
    shard_map BatchedPyramidDetector.  Exhaustive lane: the mesh-based
    batched tests above already exercise the shard_map pipeline; this
    only adds the explicit-API equivalence (229 s of CPU compiles)."""
    spec = load_cascade("haarcascade_frontalface_default")
    mesh = data_parallel_mesh(jax.devices()[:8])
    det = BatchedPyramidDetector(spec, (96, 128), 8, mesh=mesh,
                                 max_stages=5)
    ref = det.detect(frames, min_neighbors=1)
    out = detect_sharded(det.det, frames, mesh)
    got = gather_detections(out, det.det, min_neighbors=1)
    assert len(got) == 8
    for r, g in zip(ref, got):
        assert set(map(tuple, r.boxes)) == set(map(tuple, g.boxes))
