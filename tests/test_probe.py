"""Window probe / per-stage breadcrumb trace (the reusable form of the
reference's hardcoded debug probes, SURVEY.md section 4 item 4)."""

import numpy as np

from clfacedetection_tpu.detect.reference_impl import probe_window
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face


def test_probe_trace_consistent_with_run():
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((64, 64), size=44.0, seed=8)
    # scan a few windows; the trace must agree with the cascade result
    saw_pass = saw_fail = False
    for (x, y) in [(0, 0), (8, 6), (12, 10), (20, 16), (5, 14)]:
        tr = probe_window(frame, spec, x, y, scale=2.0)
        if tr["code"] == -1:
            assert tr["stages"] == []
            continue
        assert tr["vnf"] is not None and tr["vnf"] > 0
        stages = tr["stages"]
        assert stages, "in-bounds window must evaluate at least stage 0"
        if tr["code"] == 1:
            assert all(p for (_, _, _, p) in stages)
            assert len(stages) == spec.n_stages
            saw_pass = True
        else:
            # -i = failed at stage i: trace stops there, earlier pass
            fail_stage = -tr["code"]
            assert stages[-1][0] == fail_stage
            assert not stages[-1][3]
            assert all(p for (_, _, _, p) in stages[:-1])
            saw_fail = True
    assert saw_fail  # synthetic scene: most windows reject early


def test_probe_out_of_bounds():
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((48, 48), size=30.0, seed=1)
    tr = probe_window(frame, spec, 40, 40, scale=2.0)
    assert tr["code"] == -1 and tr["stages"] == []
