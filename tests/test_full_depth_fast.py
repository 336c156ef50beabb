"""Full-depth parity in the FAST lane, driven by the C oracle.

VERDICT r3 weak #6: the fast lane's parity tests ran truncated cascades
(max_stages 4-5), so a deep-stage regression would only be caught by the
slow/exhaustive lanes.  The NumPy oracle is too slow to walk full
cascades per-window in the fast lane; the C oracle
(native/haar_oracle.cpp, cross-validated in test_c_oracle.py) evaluates
millions of windows per second, making full-depth box-for-box parity
cheap.  These tests compare the f64 engine's candidate set against a
C-oracle sweep of the exact visit lattice, at FULL cascade depth
(22/20/47 stages), in both pyramid modes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from clfacedetection_tpu.detect.pyramid import PyramidDetector
from clfacedetection_tpu.detect.reference_impl import _integrals
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.models.compile import (compile_cascade, cv_round,
                                                scale_factors, scan_grid)
from clfacedetection_tpu.native import COracle, native_available
from clfacedetection_tpu.ops.resize import resize_bilinear_u8_np
from clfacedetection_tpu.utils import synth_scene

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def c_oracle_scale_image_candidates(gray, spec, scale_factor=1.1,
                                    min_size=(0, 0)):
    """Scale-image candidates via the C oracle: per level, pinned resize +
    cv2 integrals + full-depth window codes over the exact scan lattice
    (ystep = factor > 2 ? 1 : 2, strip bounds tempcv.cpp:1015-1020)."""
    compiled = compile_cascade(spec)
    H, W = gray.shape
    w0, h0 = spec.window_w, spec.window_h
    co = COracle(spec)
    out = []
    for f in scale_factors(w0, h0, W, H, scale_factor, min_size,
                           None, mode="scale_image"):
        sz_h, sz_w = int(cv_round(H / f)), int(cv_round(W / f))
        lvl = resize_bilinear_u8_np(gray, (sz_h, sz_w))
        s, q, t = _integrals(lvl, compiled.has_tilted)
        co.set_images(s, q, t, 1.0)
        ystep = 1 if f > 2 else 2
        y2, x2 = sz_h - h0, sz_w - w0
        if y2 <= 0 or x2 <= 0:
            continue
        ys, xs = np.meshgrid(np.arange(0, y2, ystep),
                             np.arange(0, x2, ystep), indexing="ij")
        ys, xs = ys.ravel().astype(np.int32), xs.ravel().astype(np.int32)
        codes, _ = co.run(xs, ys)
        win_w, win_h = int(cv_round(w0 * f)), int(cv_round(h0 * f))
        for x, y in zip(xs[codes == 1], ys[codes == 1]):
            out.append((int(cv_round(x * f)), int(cv_round(y * f)),
                        win_w, win_h))
    return out


def c_oracle_scale_cascade_candidates(gray, spec, scale_factor=1.1,
                                      min_size=(0, 0)):
    """Scale-cascade candidates via the C oracle: one integral set,
    per-scale feature rebinding in C, the exact skip-by-2 scan
    (ScaleCascade_Invoker, tempcv.cpp:1139-1170)."""
    compiled = compile_cascade(spec)
    H, W = gray.shape
    w0, h0 = spec.window_w, spec.window_h
    s, q, t = _integrals(gray, compiled.has_tilted)
    co = COracle(spec)
    out = []
    for f in scale_factors(w0, h0, W, H, scale_factor, min_size, None,
                           mode="scale_cascade"):
        co.set_images(s, q, t, f)
        win_w = int(cv_round(w0 * f))
        win_h = int(cv_round(h0 * f))
        _, xs, ys = scan_grid(W, H, win_w, win_h, f)
        if not len(xs) or not len(ys):
            continue
        # evaluate the full grid in ONE C call, then replay the
        # skip-by-2 walk on the code array (a skipped window's code
        # never influences which later windows are visited, so the
        # superset evaluation is sound)
        gy, gx = np.meshgrid(ys.astype(np.int32), xs.astype(np.int32),
                             indexing="ij")
        codes, _ = co.run(gx.ravel(), gy.ravel())
        codes = codes.reshape(len(ys), len(xs))
        for iy in range(len(ys)):
            ix = 0
            while ix < len(xs):
                res = int(codes[iy, ix])
                if res > 0:
                    out.append((int(xs[ix]), int(ys[iy]), win_w, win_h))
                ix += 1 if res != 0 else 2
    return out


def _boxes_set(b):
    return set(map(tuple, np.asarray(b, np.int64).reshape(-1, 4).tolist()))


@pytest.mark.parametrize("name", ["haarcascade_frontalface_alt",
                                  "haarcascade_frontalface_alt2",
                                  "haarcascade_frontalface_alt_tree"])
def test_full_depth_pyramid_parity_fast(name):
    """FULL-depth (no truncation) scale-image parity: f64 engine vs the
    C oracle on a 120x160 scene with a face, every stage exercised."""
    spec = load_cascade(name)
    gray = synth_scene((120, 160), faces=((60, 80, 70.0),), seed=9)
    det = PyramidDetector(spec, gray.shape, dtype=jnp.float64)
    got, ovf = det.candidates(gray)
    assert not ovf
    ref = c_oracle_scale_image_candidates(gray, spec)
    assert _boxes_set(got) == set(ref), (
        f"{len(_boxes_set(got) - set(ref))} extra, "
        f"{len(set(ref) - _boxes_set(got))} missing of {len(ref)}")
    assert len(ref) > 0, "no full-depth detection: test lost its teeth"


def test_full_depth_scale_cascade_parity_fast():
    """FULL-depth scale-cascade parity (the reference demo's own mode):
    f64 engine vs the C oracle, incl. the skip-by-2 visit set."""
    from clfacedetection_tpu.detect.detector import ScaleCascadeDetector
    spec = load_cascade("haarcascade_frontalface_default")
    gray = synth_scene((120, 160), faces=((60, 80, 70.0),), seed=9)
    det = ScaleCascadeDetector(spec, gray.shape, dtype=jnp.float64)
    got, ovf = det.candidates(gray)
    assert not ovf
    ref = c_oracle_scale_cascade_candidates(gray, spec)
    assert _boxes_set(got) == set(ref)
    assert len(ref) > 0


@pytest.mark.slow
def test_full_depth_1080p_bench_scene_parity():
    """FULL-depth parity at the bench geometry itself (1080p photo
    scene, frontalface_alt, minSize 40x40): f64 engine vs the C oracle
    over all ~2.3M visited windows x 22 stages.  Previously 1080p
    full-depth parity existed nowhere — the NumPy oracle needs hours for
    this; the C oracle does it in seconds."""
    from clfacedetection_tpu.utils import photo_scene
    spec = load_cascade("haarcascade_frontalface_alt")
    gray = photo_scene((1080, 1920))
    det = PyramidDetector(spec, gray.shape, min_size=(40, 40),
                          front_stages=12, cap=16384, dtype=jnp.float64)
    got, ovf = det.candidates(gray)
    assert not ovf
    ref = c_oracle_scale_image_candidates(gray, spec, min_size=(40, 40))
    assert _boxes_set(got) == set(ref), (
        f"{len(_boxes_set(got) - set(ref))} extra, "
        f"{len(set(ref) - _boxes_set(got))} missing of {len(ref)}")
    assert len(ref) > 0


def test_full_depth_tilted_pyramid_parity_fast():
    """FULL-depth tilted cascade (mcs_nose, 990 tilted nodes) through
    the RSAT plumbing, engine vs C oracle."""
    spec = load_cascade("haarcascade_mcs_nose")
    gray = synth_scene((96, 128), faces=((48, 64, 60.0),), seed=11)
    det = PyramidDetector(spec, gray.shape, dtype=jnp.float64)
    got, ovf = det.candidates(gray)
    assert not ovf
    ref = c_oracle_scale_image_candidates(gray, spec)
    assert _boxes_set(got) == set(ref)
