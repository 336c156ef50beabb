"""BatchedPyramidDetector.detect_stream — the bench's e2e loop.

bench.py's headline number times ``detect_stream`` (depth-3 pipelining so
tunnel sync and host grouping hide under device compute).  These tests pin
the two properties the headline silently depends on: results come back in
input order and equal the unpipelined ``detect`` path frame for frame, and
a batch that overflows the survivor cap mid-stream is transparently
re-run at the grown cap (the enqueue-time cap snapshot in
``detect_stream`` — a later batch growing ``det.cap`` must not make an
earlier truncated batch's overflow check pass vacuously).
"""

import numpy as np
import pytest

from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.runtime import BatchedPyramidDetector
from clfacedetection_tpu.utils import synth_face, synth_scene

SHAPE = (96, 128)


def _batches(n, batch=2):
    out = []
    for i in range(n):
        out.append(np.stack([
            synth_face(SHAPE, size=30.0 + 4 * i, seed=10 * i + j)
            for j in range(batch)]))
    return out


def _same(a, b):
    return (np.array_equal(a.candidates, b.candidates)
            and np.array_equal(a.boxes, b.boxes)
            and np.array_equal(a.neighbors, b.neighbors)
            and a.survivor_overflow == b.survivor_overflow)


@pytest.mark.parametrize("threaded", [True, False])
def test_stream_matches_detect_in_order(threaded):
    spec = load_cascade("haarcascade_frontalface_default")
    batches = _batches(4)
    det = BatchedPyramidDetector(spec, SHAPE, 2, max_stages=5)
    streamed = list(det.detect_stream(iter(batches), min_neighbors=1,
                                      depth=3, threaded=threaded))
    ref_det = BatchedPyramidDetector(spec, SHAPE, 2, max_stages=5)
    assert len(streamed) == len(batches)
    for k, frames in enumerate(batches):
        ref = ref_det.detect(frames, min_neighbors=1)
        for b in range(len(frames)):
            assert _same(streamed[k][b], ref[b]), f"batch {k} frame {b}"


@pytest.mark.parametrize("threaded", [True, False])
def test_stream_cap_regrowth_mid_stream(threaded):
    """Batch 0 fits the tiny cap; batch 1 (textured scene) overflows it at
    enqueue time and must be re-run at the grown cap; batch 2 is enqueued
    after the growth.  All three must equal the reference results from a
    generously-capped detector."""
    spec = load_cascade("haarcascade_frontalface_default")
    flat = np.stack([np.full(SHAPE, 128, np.uint8)] * 2)
    busy = np.stack([synth_scene(SHAPE, faces=((48, 40, 30.0),),
                                 seed=s, texture=60.0) for s in (1, 2)])
    batches = [flat, busy, _batches(1)[0]]

    det = BatchedPyramidDetector(spec, SHAPE, 2, max_stages=4,
                                 front_stages=2, cap=32)
    streamed = list(det.detect_stream(iter(batches), min_neighbors=0,
                                      depth=2, threaded=threaded))
    assert det.det.cap > 32, "test scene never overflowed the tiny cap"
    assert not any(r.survivor_overflow for res in streamed for r in res)

    ref_det = BatchedPyramidDetector(spec, SHAPE, 2, max_stages=4,
                                     front_stages=2)
    for k, frames in enumerate(batches):
        ref = ref_det.detect(frames, min_neighbors=0)
        for b in range(len(frames)):
            assert _same(streamed[k][b], ref[b]), f"batch {k} frame {b}"
