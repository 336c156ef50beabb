"""Pallas survivor-tail kernel == XLA tail, box for box (TPU only).

The CPU suite can't run Mosaic kernels; this is exercised on real TPU
hardware (verified at 1080p: 102/102 candidate boxes identical to the
XLA tail, node values within f32 accumulation-order noise ~6e-5 abs;
see ops/haar_tail.py and docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="Pallas TPU kernel")


def _boxes(det, img):
    b, _ = det.candidates(img)
    return set(map(tuple, b.tolist()))


def test_tail_kernel_matches_xla_tail():
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(60, 100))
    spec = load_cascade("haarcascade_frontalface_alt")
    dk = PyramidDetector(spec, img.shape, min_size=(40, 40))
    assert dk.use_pallas_tail
    dk.use_pallas_tail2 = False          # pin the v1 kernel path
    dx = PyramidDetector(spec, img.shape, min_size=(40, 40))
    dx.use_pallas_tail = False
    assert _boxes(dk, img) == _boxes(dx, img)


def test_tail2_kernel_matches_xla_tail():
    """v2 (in-kernel cascade walk + early exit) == XLA tail, box for box,
    on a stump cascade."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(60, 100))
    spec = load_cascade("haarcascade_frontalface_alt")
    dk = PyramidDetector(spec, img.shape, min_size=(40, 40),
                         front_stages=8)
    assert dk.use_pallas_tail2
    assert dk._tail2_kernel_for() is not None
    dx = PyramidDetector(spec, img.shape, min_size=(40, 40),
                         front_stages=8)
    dx.use_pallas_tail = False
    assert _boxes(dk, img) == _boxes(dx, img)


def test_tail2_roc_matches_xla():
    """v2 in-kernel level/weight tracking == the XLA ROC fields."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(60, 100))
    spec = load_cascade("haarcascade_frontalface_alt")
    dk = PyramidDetector(spec, img.shape, min_size=(40, 40),
                         front_stages=8, output_levels=True)
    assert dk.use_pallas_tail2
    dx = PyramidDetector(spec, img.shape, min_size=(40, 40),
                         front_stages=8, output_levels=True)
    dx.use_pallas_tail = False
    bk, lk, wk, _ = dk.candidates_with_levels(img)
    bx, lx, wx, _ = dx.candidates_with_levels(img)
    ok = np.lexsort(np.asarray(bk).T)
    ox = np.lexsort(np.asarray(bx).T)
    assert np.array_equal(np.asarray(bk)[ok], np.asarray(bx)[ox])
    assert np.array_equal(np.asarray(lk)[ok], np.asarray(lx)[ox])
    np.testing.assert_allclose(np.asarray(wk)[ok], np.asarray(wx)[ox],
                               atol=2e-3)


def test_tail2_batched():
    """Batched v2 grid == per-frame single results."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.runtime.batch import BatchedPyramidDetector
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    frames = np.stack([img, img[::-1].copy(),
                       np.ascontiguousarray(img[:, ::-1])])
    bdet = BatchedPyramidDetector(spec, img.shape, 3, min_size=(40, 40),
                                  front_stages=8)
    assert bdet.det.use_pallas_tail2
    res = bdet.detect(frames, min_neighbors=0)
    sdet = PyramidDetector(spec, img.shape, min_size=(40, 40),
                           front_stages=8)
    for i, r in enumerate(res):
        c1, _ = sdet.candidates(frames[i])
        assert set(map(tuple, r.candidates.tolist())) == \
            set(map(tuple, np.asarray(c1).tolist()))


def test_tail_kernel_wide_window():
    """64-lane patch packing: the 45x11-window (tilted) mcs_eyepair_big
    cascade — previously the one bundled cascade the kernel tail could
    not serve — matches the XLA tail box for box."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(60, 100))
    spec = load_cascade("haarcascade_mcs_eyepair_big")
    dk = PyramidDetector(spec, img.shape, min_size=(90, 22))
    assert dk.use_pallas_tail
    assert not dk.use_pallas_tail2          # wide windows stay on v1
    dx = PyramidDetector(spec, img.shape, min_size=(90, 22))
    dx.use_pallas_tail = False
    assert _boxes(dk, img) == _boxes(dx, img)


def test_tail_kernel_node_values():
    """Kernel node values vs the XLA extraction+matmul on real planes."""
    from clfacedetection_tpu.detect.pyramid import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.ops.haar_tail import band_slots, plan_bands
    from clfacedetection_tpu.utils import photo_scene

    spec = load_cascade("haarcascade_frontalface_alt")
    img = photo_scene((480, 640), face_sizes=(60, 100))
    det = PyramidDetector(spec, img.shape, min_size=(40, 40))
    assert det.use_pallas_tail
    g = jnp.asarray(img, jnp.uint8)
    f = det._jit_front(g)
    si, _ = det._jit_compact(f["front"])
    shape = (det.plan.canvas_h + 1, det.plan.canvas_w + 1)
    nb, r = plan_bands(shape[0])
    sl = jax.jit(lambda s: band_slots(s, shape[1], shape[0] * shape[1],
                                      nb, r, det.tail_chunkk, det.cap))(si)
    slot_y, slot_x, slot_valid, _, alo, cnt = [np.asarray(a) for a in sl]
    kernel = det._tail_kernel_for(None)
    slot_yx = jnp.asarray(slot_y * 65536 + slot_x, jnp.int32)
    vals = np.asarray(jax.jit(kernel)(
        f["planes"]["sum"], slot_yx, jnp.asarray(alo), jnp.asarray(cnt)))

    P = det.h0 + 1

    def xla_vals(plane, sy, sx):
        raw = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            plane, (y, x), (P, P)))(sy, sx)
        corner = raw[:, 0, 0][:, None, None]
        rr = raw - corner
        rr = rr - rr[:, 0:1, :] - rr[:, :, 0:1]
        return jnp.dot(rr.reshape(-1, P * P).astype(jnp.float32),
                       jnp.asarray(det._sten_sum),
                       precision=jax.lax.Precision.HIGHEST)

    ref = np.asarray(jax.jit(xla_vals)(f["planes"]["sum"],
                                       jnp.asarray(slot_y),
                                       jnp.asarray(slot_x)))
    n = det.tables.n_clf * det.tables.T
    m = slot_valid
    assert m.sum() > 100
    np.testing.assert_allclose(vals[m][:, :n], ref[m], atol=2e-3)


def test_tail_kernel_blocked_stencil():
    """frontalface_default (2913 nodes x 32 patch rows) exceeds the VMEM
    stencil budget and exercises the NN-blocked grid axis."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(60, 100))
    spec = load_cascade("haarcascade_frontalface_default")
    dk = PyramidDetector(spec, img.shape, min_size=(40, 40))
    assert dk.use_pallas_tail
    dx = PyramidDetector(spec, img.shape, min_size=(40, 40))
    dx.use_pallas_tail = False
    assert _boxes(dk, img) == _boxes(dx, img)


def test_tail_kernel_tilted():
    """Tilted cascades route the rotated integral through a second band
    + stencil (corner-only patch correction, tempcv.cpp:743-750).
    A tiny symmetric difference is tolerated: tilted patch values are
    only constant-corrected, so near-threshold windows can flip between
    the kernel's and XLA's f32 accumulation orders (measured 1 of 2597
    on mcs_nose)."""
    from clfacedetection_tpu.detect import PyramidDetector
    from clfacedetection_tpu.models import load_cascade
    from clfacedetection_tpu.utils import photo_scene

    img = photo_scene((480, 640), face_sizes=(120,))
    spec = load_cascade("haarcascade_mcs_nose")
    dk = PyramidDetector(spec, img.shape, min_size=(24, 24), max_stages=8)
    assert dk.use_pallas_tail
    dx = PyramidDetector(spec, img.shape, min_size=(24, 24), max_stages=8)
    dx.use_pallas_tail = False
    a, b = _boxes(dk, img), _boxes(dx, img)
    assert len(a ^ b) <= max(2, len(b) // 200), (len(a), len(b), len(a & b))
