"""Cross-validation of the two independent oracles (VERDICT r3 Missing #2).

``detect/reference_impl.py`` (NumPy) and ``native/haar_oracle.cpp`` (C)
both implement the reference's evaluation core -- variance normalization,
CART walk, sequential stage loop, stage-tree DFS, per-scale rect scaling
with weight renormalization (tempcv.cpp:549-948) -- but were written
independently and consume different inputs (the NumPy oracle walks the
``CompiledCascade.at_scale`` tables; the C oracle re-derives everything
from the raw ``CascadeSpec`` arrays).  A bug shared by the engine and one
oracle is caught by the other: these tests demand window-for-window
agreement on exit codes and bit-level agreement on stage sums across
cascade families (stump / CART / stage-tree / tilted) and the random
property-cascade corners.
"""

import numpy as np
import pytest

from clfacedetection_tpu.detect.reference_impl import (RefWindowEvaluator,
                                                       _integrals)
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.models.compile import (compile_cascade,
                                                truncate_cascade)
from clfacedetection_tpu.native import COracle, native_available
from clfacedetection_tpu.utils import synth_face

from test_property_cascades import CASES, _random_spec

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _cross_check(spec, img, scales, step=3, max_stages=None):
    """Both oracles over a full scan grid at each scale: codes must match
    exactly, stage sums to double rounding (both accumulate in double
    from float tables, in the same order -- agreement is essentially
    bit-level; the tolerance only absorbs libm/np ulp differences)."""
    compiled = compile_cascade(spec)
    if max_stages is not None:
        compiled = truncate_cascade(compiled, max_stages)
        spec = compiled.spec
    s_img, sq_img, t_img = _integrals(np.asarray(img, np.uint8),
                                      compiled.has_tilted)
    co = COracle(spec)
    H, W = img.shape
    checked = 0
    codes_seen = set()
    for f in scales:
        scaled = compiled.at_scale(f)
        ev = RefWindowEvaluator(compiled, scaled, s_img, sq_img, t_img)
        # Tilted corners can overhang the scaled window by 1-2 px from
        # per-term cvRound (e.g. ty+tw+th vs cvRound(h0*s)); OpenCV reads
        # that slack from adjacent image memory, the NumPy oracle would
        # raise.  Keep the grid where every corner is in-plane (interior
        # positions -- the overwhelming majority of the visit set) and
        # probe the bounds-reject code explicitly below.
        present = scaled.weight != 0.0
        ext_x_hi = max(int(scaled.corner_x[present].max()),
                       int(scaled.equ_corner_x.max()))
        ext_x_lo = min(int(scaled.corner_x[present].min()), 0)
        ext_y_hi = max(int(scaled.corner_y[present].max()),
                       int(scaled.equ_corner_y.max()))
        x_hi = min(W - scaled.win_w, W - ext_x_hi)
        y_hi = min(H - scaled.win_h, H - ext_y_hi)
        ys, xs = np.meshgrid(
            np.arange(0, y_hi + 1, step),
            np.arange(max(0, -ext_x_lo), x_hi + 1, step), indexing="ij")
        ys, xs = ys.ravel(), xs.ravel()
        # bounds-reject probes (code -1, no memory touched)
        xs = np.concatenate([xs, [-3, W - scaled.win_w + 1, 0]])
        ys = np.concatenate([ys, [0, 0, H - scaled.win_h + 1]])
        ref = [ev.run_sum(int(x), int(y)) for x, y in zip(xs, ys)]
        ref_codes = np.array([r[0] for r in ref], np.int32)
        ref_sums = np.array([r[1] for r in ref], np.float64)
        co.set_images(s_img, sq_img, t_img, f)
        got_codes, got_sums = co.run(xs, ys)
        assert np.array_equal(got_codes, ref_codes), (
            f"scale {f}: {np.sum(got_codes != ref_codes)} of "
            f"{len(ref_codes)} window codes differ")
        ok = np.isclose(got_sums, ref_sums, rtol=1e-12, atol=1e-9)
        assert ok.all(), (
            f"scale {f}: stage sums diverge at "
            f"{np.argwhere(~ok).ravel()[:5]}")
        checked += len(xs)
        codes_seen.update(np.unique(ref_codes).tolist())
    return checked, codes_seen


def test_c_oracle_stump_cascade():
    """frontalface_alt: pure stumps, full depth."""
    spec = load_cascade("haarcascade_frontalface_alt")
    img = synth_face((96, 128), size=60.0, seed=3)
    n, codes = _cross_check(spec, img, scales=[1.0, 1.5, 2.2])
    assert n > 2000 and -1 in codes and min(codes) <= -1


def test_c_oracle_cart_cascade():
    """frontalface_alt2: CART trees (left_node links)."""
    spec = load_cascade("haarcascade_frontalface_alt2")
    img = synth_face((96, 128), size=60.0, seed=4)
    _cross_check(spec, img, scales=[1.0, 1.7])


def test_c_oracle_stage_tree_cascade():
    """frontalface_alt_tree: stage-tree DFS (parent/next/child links)."""
    spec = load_cascade("haarcascade_frontalface_alt_tree")
    img = synth_face((96, 128), size=60.0, seed=5)
    n, codes = _cross_check(spec, img, scales=[1.0, 1.5])
    assert codes <= {-1, 0, 1}   # tree cascades never return -i


def test_c_oracle_tilted_cascade():
    """mcs_nose: 990 tilted nodes through the 45-degree RSAT corners."""
    spec = load_cascade("haarcascade_mcs_nose")
    img = synth_face((96, 128), size=70.0, seed=6)
    _cross_check(spec, img, scales=[1.0, 1.4, 2.0])


def test_c_oracle_accepting_windows():
    """Truncated cascade so windows actually PASS: the agreement must
    cover code 1 and deep stage sums, not just early rejects."""
    spec = load_cascade("haarcascade_frontalface_alt")
    img = synth_face((96, 128), size=60.0, seed=7)
    n, codes = _cross_check(spec, img, scales=[1.0, 1.3], step=2,
                            max_stages=5)
    assert 1 in codes, "no window passed: the test lost its teeth"


ALL_19 = [
    "haarcascade_eye", "haarcascade_eye_tree_eyeglasses",
    "haarcascade_frontalface_alt", "haarcascade_frontalface_alt2",
    "haarcascade_frontalface_alt_tree", "haarcascade_frontalface_default",
    "haarcascade_fullbody", "haarcascade_lefteye_2splits",
    "haarcascade_lowerbody", "haarcascade_mcs_eyepair_big",
    "haarcascade_mcs_eyepair_small", "haarcascade_mcs_lefteye",
    "haarcascade_mcs_mouth", "haarcascade_mcs_nose",
    "haarcascade_mcs_righteye", "haarcascade_mcs_upperbody",
    "haarcascade_profileface", "haarcascade_righteye_2splits",
    "haarcascade_upperbody",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL_19)
def test_c_oracle_all_19_bundled(name):
    """Oracle cross-validation over the ENTIRE bundled model zoo: every
    shipped cascade, full depth, both oracles window-for-window (the
    fast-lane tests cover one representative per structural family)."""
    spec = load_cascade(name)
    img = synth_face((80, 100), size=56.0, seed=hash(name) % 1000)
    _cross_check(spec, img, scales=[1.0, 1.6], step=2)


@pytest.mark.parametrize("case", CASES,
                         ids=[f"s{c['seed']}" for c in CASES])
def test_c_oracle_property_cascades(case):
    """Random cascades from the property generator: stumps, CART mixes,
    tilted mixes, single-stage degenerates."""
    rng = np.random.default_rng(case["seed"])
    spec = _random_spec(rng, case["n_stages"], case["cart"],
                        case["tilted"])
    img = rng.integers(0, 256, (64, 80), np.uint8)
    n, codes = _cross_check(spec, img, scales=[1.0, 1.4], step=2)
    assert 1 in codes or min(codes) < 0
