"""Multi-cascade batched detection (BASELINE config 5).

The reference benchmark loop times one ``cvHaarDetectObjects`` call per
cascade (main.cpp:72-97); config 5 of BASELINE.json asks for
profileface + upperbody + fullbody over 1080p frame batches.  These
tests validate the fused K-cascade step against per-cascade
BatchedPyramidDetector runs, frame for frame and box for box.
"""

import jax
import numpy as np
import pytest

from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.runtime import (
    BatchedPyramidDetector, MultiCascadeBatchedDetector,
    data_parallel_mesh)
from clfacedetection_tpu.utils import synth_face


SHAPE = (96, 128)


@pytest.fixture(scope="module")
def frames():
    return np.stack([synth_face(SHAPE, size=30.0, seed=i)
                     for i in range(8)])


def _cand_sets(results):
    return [set(map(tuple, r.candidates)) for r in results]


def test_multi_matches_per_cascade(frames):
    """Fused 2-cascade step == two independent batched runs."""
    names = ["haarcascade_frontalface_default", "haarcascade_profileface"]
    specs = [load_cascade(n) for n in names]
    batch = frames[:2]
    multi = MultiCascadeBatchedDetector(specs, SHAPE, 2, max_stages=4)
    got = multi.detect(batch, min_neighbors=0)
    assert len(got) == len(specs) and all(len(g) == 2 for g in got)
    for k, spec in enumerate(specs):
        single = BatchedPyramidDetector(spec, SHAPE, 2, max_stages=4)
        ref = single.detect(batch, min_neighbors=0)
        assert _cand_sets(got[k]) == _cand_sets(ref), names[k]


@pytest.mark.slow
def test_multi_empty_cascade_slot(frames):
    """A cascade whose window exceeds the frame yields empties without
    disturbing the other cascades' slots."""
    specs = [load_cascade("haarcascade_frontalface_default"),
             load_cascade("haarcascade_fullbody")]
    batch = frames[:2]
    # fullbody is 14x28; min_size larger than the frame kills its pyramid
    multi = MultiCascadeBatchedDetector(specs, SHAPE, 2, max_stages=4,
                                        min_size=(0, 0))
    got = multi.detect(batch, min_neighbors=0)
    assert len(got) == 2
    small = MultiCascadeBatchedDetector(
        [load_cascade("haarcascade_fullbody")], (20, 20), 2, max_stages=4)
    empt = small.detect(np.zeros((2, 20, 20), np.uint8), min_neighbors=0)
    assert all(len(r.candidates) == 0 for r in empt[0])


@pytest.mark.exhaustive
def test_multi_cap_regrowth(frames):
    """A deliberately tiny survivor cap overflows; the fused step must
    regrow only as needed, rebuild, and land on the uncapped answer."""
    names = ["haarcascade_frontalface_default", "haarcascade_profileface"]
    specs = [load_cascade(n) for n in names]
    batch = frames[:2]
    tiny = MultiCascadeBatchedDetector(specs, SHAPE, 2, max_stages=4,
                                       cap=512)
    big = MultiCascadeBatchedDetector(specs, SHAPE, 2, max_stages=4)
    got = tiny.detect(batch, min_neighbors=0)
    ref = big.detect(batch, min_neighbors=0)
    assert all(tiny.subs[k].det.cap > 512 for k in tiny._active)
    for k in range(len(specs)):
        assert _cand_sets(got[k]) == _cand_sets(ref[k]), names[k]
        assert not any(r.survivor_overflow for r in got[k])


@pytest.mark.slow
def test_multi_stream_matches_detect(frames):
    names = ["haarcascade_frontalface_default", "haarcascade_profileface"]
    specs = [load_cascade(n) for n in names]
    multi = MultiCascadeBatchedDetector(specs, SHAPE, 2, max_stages=4)
    batches = [frames[i:i + 2] for i in range(0, 8, 2)]
    streamed = list(multi.detect_stream(iter(batches), min_neighbors=0,
                                        depth=2))
    for bi, batch in enumerate(batches):
        direct = multi.detect(batch, min_neighbors=0)
        for k in range(len(specs)):
            assert _cand_sets(streamed[bi][k]) == _cand_sets(direct[k]), \
                (bi, names[k])


@pytest.mark.exhaustive
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multi_sharded_matches_unsharded(frames):
    """config 5 on the mesh: the fused 3-cascade shard_map program over
    8 virtual devices == the unsharded fused program."""
    names = ["haarcascade_frontalface_default",
             "haarcascade_profileface",
             "haarcascade_upperbody"]
    specs = [load_cascade(n) for n in names]
    mesh = data_parallel_mesh(jax.devices()[:8])
    sharded = MultiCascadeBatchedDetector(specs, SHAPE, 8, mesh=mesh,
                                          max_stages=4)
    plain = MultiCascadeBatchedDetector(specs, SHAPE, 8, max_stages=4)
    got = sharded.detect(frames, min_neighbors=0)
    ref = plain.detect(frames, min_neighbors=0)
    for k in range(len(specs)):
        assert _cand_sets(got[k]) == _cand_sets(ref[k]), names[k]
