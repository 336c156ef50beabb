"""bench.py's headline-config selection rule (bench._select).

The recorded headline regressed in rounds 3-4 because selection keyed
on noisy signals (raw e2e argmax in r4; a weather-anchored host model
in early r5 that a 12.8 MB/s outlier probe polluted).  The rule under
test: device time (stable <0.2% run-to-run) gates the candidate set to
within 2%, then the best MEASURED e2e wins — a model never overrides a
measurement.  Reference analog: the honest per-frame comparison loop
of CLFaceDetection/main.cpp:72-97.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _select  # noqa: E402


def row(dev_ms, e2e_ms, batch=8, front=10, cap=20480):
    return (dev_ms, e2e_ms / 1e3, 1e3 / e2e_ms, batch, None, 18388,
            front, cap)


def test_best_e2e_among_device_ties_wins():
    # the round-5 session sweep, verbatim: b8 and b16 tie on device
    # (37.62 vs 37.65) but b8's measured e2e is 44.37 vs 53.08 — the
    # weather-anchored model had picked b16 (rtt/16 < rtt/8)
    rows = [row(37.62, 44.37, batch=8), row(37.65, 53.08, batch=16),
            row(38.62, 61.58, batch=8, cap=32768),
            row(45.26, 59.55, batch=8, front=12, cap=16384)]
    got = _select(rows)
    assert got[3] == 8 and got[0] == 37.62


def test_device_gate_excludes_slower_configs_with_lucky_e2e():
    # a config 5% slower on device must not win on one lucky e2e pass
    rows = [row(37.6, 46.0, batch=8), row(39.5, 41.0, batch=16)]
    assert _select(rows)[3] == 8


def test_within_two_percent_is_a_tie():
    # 1.5% device delta is inside the gate; e2e decides
    rows = [row(37.6, 46.0, batch=8), row(38.1, 43.0, batch=16)]
    assert _select(rows)[3] == 16


def test_single_row():
    rows = [row(45.0, 60.0)]
    assert _select(rows) is rows[0]
