"""Pallas-kernel equivalence WITHOUT hardware: interpret-mode runs on CPU.

The TPU suites (test_front_kernel / test_tail_kernel, CLFD_TEST_TPU=1)
remain the authoritative hardware checks; this lane runs the same
kernels through ``pallas_call(interpret=True)`` against the XLA
specification paths so kernel-logic regressions surface in the normal
CPU suite — no tunnel required.  Shapes are kept tiny: interpret mode
executes the grid serially on CPU."""

import os
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import clfacedetection_tpu.ops.haar_front as hf
import clfacedetection_tpu.ops.haar_tail as ht
import clfacedetection_tpu.ops.haar_tail2 as ht2
from clfacedetection_tpu.detect.pyramid import PyramidDetector
from clfacedetection_tpu.models import load_cascade
from clfacedetection_tpu.utils import synth_face

_ORIG = pl.pallas_call


def _interp(*a, **k):
    k["interpret"] = True
    return _ORIG(*a, **k)


def _patched():
    return (mock.patch.object(hf.pl, "pallas_call", _interp),
            mock.patch.object(ht.pl, "pallas_call", _interp),
            mock.patch.object(ht2.pl, "pallas_call", _interp))


def _front_pair(cascade, shape, seed, **kw):
    spec = load_cascade(cascade)
    frame = synth_face(shape, size=min(shape) * 0.45, seed=seed)
    g = jnp.asarray(frame, jnp.uint8)
    ref = jax.jit(PyramidDetector(spec, shape, use_pallas_front=False,
                                  **kw)._front_device)(g)
    a, b, c = _patched()
    with a, b, c:
        det = PyramidDetector(spec, shape, use_pallas_front=True, **kw)
        got = det._front_device(g)
    return ref, got


def test_front_interpret_stumps():
    ref, got = _front_pair("haarcascade_frontalface_default", (96, 128),
                           seed=3, front_stages=3, max_stages=4)
    assert jnp.array_equal(ref["front"], got["front"])
    assert jnp.array_equal(ref["vnf"].astype(jnp.float32), got["vnf"])


def test_front_interpret_cart_tilted():
    """CART nodes + tilted features through the kernel's 4-corner path."""
    ref, got = _front_pair("haarcascade_mcs_nose", (80, 96),
                           seed=11, front_stages=4, max_stages=4)
    assert jnp.array_equal(ref["front"], got["front"])
    assert jnp.array_equal(ref["vnf"].astype(jnp.float32), got["vnf"])


def test_front_interpret_colcache():
    """CLFD_FRONT_COLCACHE=1 must be bit-identical (it caches identical
    slice values)."""
    with mock.patch.dict(os.environ, {"CLFD_FRONT_COLCACHE": "1"}):
        ref, got = _front_pair("haarcascade_frontalface_alt", (96, 128),
                               seed=4, front_stages=12)
    assert jnp.array_equal(ref["front"], got["front"])
    assert jnp.array_equal(ref["vnf"].astype(jnp.float32), got["vnf"])


def _force_kernel_tails(det):
    """Re-derive the TPU-only tail eligibility (the constructor gates on
    jax.default_backend() == 'tpu', which is 'cpu' here)."""
    det.use_pallas_tail = True
    det.use_pallas_tail2 = (det.tables.T == 1 and not det.is_tree
                            and not det.compiled.has_tilted
                            and det.w0 + 1 <= 32
                            and det.front_k < det.n_stages)


@pytest.mark.exhaustive
def test_roc_interpret_levels_weights():
    """ROC output through the in-kernel walk (exit level + stage sum
    computed on-'chip', packed single-array readback) vs the XLA path."""
    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=44.0, seed=7)
    kw = dict(front_stages=3, cap=512, max_stages=8, output_levels=True)
    b_ref, lv_ref, w_ref, _ = PyramidDetector(
        spec, (96, 128), use_pallas_front=False,
        **kw).candidates_with_levels(frame)
    a, b_, c = _patched()
    with a, b_, c:
        det = PyramidDetector(spec, (96, 128), use_pallas_front=True, **kw)
        _force_kernel_tails(det)
        b, lv, w, _ = det.candidates_with_levels(frame)
    assert len(b_ref) > 0
    o_ref = np.lexsort(np.asarray(b_ref).T)
    o = np.lexsort(np.asarray(b).T)
    assert np.array_equal(np.asarray(b)[o], np.asarray(b_ref)[o_ref])
    assert np.array_equal(np.asarray(lv)[o], np.asarray(lv_ref)[o_ref])
    assert np.allclose(np.asarray(w)[o], np.asarray(w_ref)[o_ref],
                       rtol=1e-6)


@pytest.mark.exhaustive
def test_batched_kernel_grid_interpret():
    """The batch-gridded front kernel + batched tail (the bench's actual
    device path) against the per-frame XLA pipeline, chip-free."""
    from clfacedetection_tpu.runtime import BatchedPyramidDetector

    spec = load_cascade("haarcascade_frontalface_default")
    frames = np.stack([synth_face((96, 128), size=40.0, seed=i)
                       for i in (3, 9)])
    ref_det = PyramidDetector(spec, (96, 128), max_stages=6, cap=256,
                              use_pallas_front=False)
    a, b, c = _patched()
    with a, b, c:
        bdet = BatchedPyramidDetector(spec, (96, 128), 2, max_stages=6,
                                      cap=256, use_pallas_front=True)
        _force_kernel_tails(bdet.det)
        bdet._build_step()
        res = bdet.detect(frames, min_neighbors=0)
    for i in range(2):
        ref, _ = ref_det.candidates(frames[i])
        assert len(ref) > 0
        assert np.array_equal(np.sort(res[i].candidates, 0),
                              np.sort(np.asarray(ref), 0)), f"frame {i}"


@pytest.mark.exhaustive
def test_multi_cascade_fused_readback_interpret():
    """The multi-cascade fused single-array readback (``packed_all``)
    exists only when every cascade takes the kernel-tail path — on CPU
    the XLA tail carries no packed buffer, so this TPU-only branch is
    validated chip-free: the stacked K-cascade readback must de-slice to
    the same boxes as the per-frame XLA pipelines."""
    from clfacedetection_tpu.runtime import MultiCascadeBatchedDetector

    names = ["haarcascade_frontalface_default", "haarcascade_profileface"]
    specs = [load_cascade(n) for n in names]
    frames = np.stack([synth_face((96, 128), size=40.0, seed=i)
                       for i in (3, 9)])
    refs = [PyramidDetector(s, (96, 128), max_stages=6, cap=256,
                            use_pallas_front=False) for s in specs]
    a, b, c = _patched()
    with a, b, c:
        multi = MultiCascadeBatchedDetector(specs, (96, 128), 2,
                                            max_stages=6, cap=256,
                                            use_pallas_front=True)
        for k in multi._active:
            _force_kernel_tails(multi.subs[k].det)
        multi._build_step()
        shapes = jax.eval_shape(multi._jit_step,
                                jnp.zeros((2, 96, 128), jnp.uint8))
        assert "packed_all" in shapes, "fused readback path not taken"
        res = multi.detect(frames, min_neighbors=0)
    for k, name in enumerate(names):
        for i in range(2):
            ref, _ = refs[k].candidates(frames[i])
            assert len(ref) > 0
            assert np.array_equal(
                np.sort(res[k][i].candidates, 0),
                np.sort(np.asarray(ref), 0)), (name, i)


@pytest.mark.exhaustive
def test_strips_interpret_pallas_front():
    """The row-strip sharding's Pallas path (strip front kernel with the
    per-shard visit mask as a runtime operand) under shard_map on the
    virtual mesh, validated chip-free in interpret mode."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh
    from clfacedetection_tpu.parallel import StripShardedPyramidDetector

    spec = load_cascade("haarcascade_frontalface_default")
    frame = synth_face((96, 128), size=40.0, seed=3)
    ref, _ = PyramidDetector(spec, (96, 128), max_stages=6, cap=256,
                             use_pallas_front=False).candidates(frame)
    a, b, c = _patched()
    with a, b, c:
        det = PyramidDetector(spec, (96, 128), max_stages=6, cap=256,
                              use_pallas_front=True)
        mesh = Mesh(np.array(jax.devices()[:4]), ("strips",))
        got, _ = StripShardedPyramidDetector(det, mesh).candidates(frame)
    assert len(ref) > 0
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.exhaustive
def test_wide_window_64lane_tail_interpret():
    """The 45x11-window cascade takes the 64-lane patch-packing path of
    the v1 stencil tail (w0+1 > 32) — previously TPU-only coverage."""
    spec = load_cascade("haarcascade_mcs_eyepair_big")
    assert spec.window_w + 1 > 32
    frame = synth_face((72, 120), size=50.0, seed=5)
    g = jnp.asarray(frame, jnp.uint8)
    ref_det = PyramidDetector(spec, (72, 120), front_stages=2, cap=512,
                              max_stages=6, use_pallas_front=False)
    ref = jax.jit(ref_det._detect_device)(g)
    ok = np.asarray(ref["ok"])
    want = set(zip(np.asarray(ref["sy"])[ok].tolist(),
                   np.asarray(ref["sx"])[ok].tolist()))
    assert want, "fixture must accept some windows"
    a, b, c = _patched()
    with a, b, c:
        det = PyramidDetector(spec, (72, 120), front_stages=2, cap=512,
                              max_stages=6, use_pallas_front=True)
        det.use_pallas_tail = True      # wide window -> v1 64-lane path
        det.use_pallas_tail2 = False
        out = det._detect_device(g)
    p = np.asarray(out["packed"])
    acap = (len(p) - 2) // 2
    n_acc = int(p[1])
    got = set(zip(p[2:2 + n_acc].tolist(),
                  p[2 + acap:2 + acap + n_acc].tolist()))
    assert got == want


@pytest.mark.exhaustive
def test_tilted_tail_interpret():
    """Tilted cascade through the v1 tail (second RSAT band + tilted
    corner-corrected stencil) — previously TPU-only coverage."""
    spec = load_cascade("haarcascade_mcs_nose")
    frame = synth_face((80, 96), size=36.0, seed=11)
    g = jnp.asarray(frame, jnp.uint8)
    ref_det = PyramidDetector(spec, (80, 96), front_stages=2, cap=512,
                              max_stages=5, use_pallas_front=False)
    ref = jax.jit(ref_det._detect_device)(g)
    ok = np.asarray(ref["ok"])
    want = set(zip(np.asarray(ref["sy"])[ok].tolist(),
                   np.asarray(ref["sx"])[ok].tolist()))
    assert want, "fixture must accept some windows"
    a, b, c = _patched()
    with a, b, c:
        det = PyramidDetector(spec, (80, 96), front_stages=2, cap=512,
                              max_stages=5, use_pallas_front=True)
        det.use_pallas_tail = True   # tilted -> v1 with the RSAT band
        det.use_pallas_tail2 = False
        out = det._detect_device(g)
    p = np.asarray(out["packed"])
    acap = (len(p) - 2) // 2
    n_acc = int(p[1])
    got = set(zip(p[2:2 + n_acc].tolist(),
                  p[2 + acap:2 + acap + n_acc].tolist()))
    assert got == want


@pytest.mark.exhaustive
def test_pipeline_interpret_tail_accept_set():
    """Full interpret pipeline (front kernel -> compaction -> tail
    kernel walk) reproduces the XLA pipeline's accepted windows, on a
    truncated cascade so the accept set is non-empty."""
    spec = load_cascade("haarcascade_frontalface_default")
    shape = (96, 128)
    frame = synth_face(shape, size=44.0, seed=7)
    g = jnp.asarray(frame, jnp.uint8)
    det_ref = PyramidDetector(spec, shape, front_stages=3, cap=512,
                              max_stages=8, use_pallas_front=False)
    ref = jax.jit(det_ref._detect_device)(g)
    ok = np.asarray(ref["ok"])
    sy, sx = np.asarray(ref["sy"]), np.asarray(ref["sx"])
    want = set(zip(sy[ok].tolist(), sx[ok].tolist()))
    assert want, "fixture must accept some windows"

    a, b, c = _patched()
    with a, b, c:
        det = PyramidDetector(spec, shape, front_stages=3, cap=512,
                              max_stages=8, use_pallas_front=True)
        _force_kernel_tails(det)
        out = det._detect_device(g)
    assert "packed" in out, "kernel tail must produce the packed readback"
    p = np.asarray(out["packed"])
    acap = (len(p) - 2) // 2
    n_acc = int(p[1])
    assert n_acc <= acap
    got = set(zip(p[2:2 + n_acc].tolist(),
                  p[2 + acap:2 + acap + n_acc].tolist()))
    assert got == want
