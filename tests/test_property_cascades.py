"""Property tests on cascade compilation (SURVEY.md section 4): randomly
generated cascades — stumps, CART trees, tilted features, degenerate
shapes — must (a) survive an XML write/parse round trip bit-exactly and
(b) produce oracle-identical detections through the compiled f64
pipeline.  The bundled-model parity suites pin the 19 real cascades;
this suite walks the model-space corners they don't cover (single-stage
cascades, 1-classifier stages, absent third rects, mixed CART depths)."""

import numpy as np
import pytest

from clfacedetection_tpu.detect import PyramidDetector
from clfacedetection_tpu.detect.reference_impl import (
    detect_multi_scale_reference)
from clfacedetection_tpu.models.haar_xml import parse_haar_xml_bytes
from clfacedetection_tpu.models.haar_xml_writer import haar_xml_bytes
from clfacedetection_tpu.models.spec import CascadeSpec


def _random_spec(rng: np.random.Generator, n_stages: int, cart: bool,
                 tilted: bool, w0: int = 16, h0: int = 16) -> CascadeSpec:
    """A random but structurally valid cascade: every rect inside the
    window (tilted rects need x+w+h <= w0 and y+... like OpenCV's
    validity envelope — kept conservative), CART classifiers are
    depth-2 trees with 3 nodes, weights/thresholds/alphas drawn so
    typical uint8 image content produces mixed votes."""
    nodes = []            # (rects[3], tilted, thr, left, right)
    clf_ofs, clf_cnt, alpha_ofs, alphas = [], [], [], []
    st_ofs, st_cnt, st_thr = [], [], []

    def rand_rect(max_w, max_h):
        w = int(rng.integers(2, max_w - 1))
        h = int(rng.integers(2, max_h - 1))
        x = int(rng.integers(0, max_w - w))
        y = int(rng.integers(0, max_h - h))
        return x, y, w, h

    def rand_node(force_upright=False):
        use_tilt = tilted and not force_upright and rng.random() < 0.4
        # conservative envelope so tilted corners stay inside the window
        if use_tilt:
            # OpenCV tilted validity (tempcv.cpp:743-750 corner map):
            # x - h >= 0, x + w <= w0, y + w + h <= h0
            w = int(rng.integers(2, 6))
            h = int(rng.integers(2, 5))
            x = int(rng.integers(h, w0 - w + 1))
            y = int(rng.integers(0, h0 - w - h + 1))
            r0 = (x, y, w, h)
        else:
            r0 = rand_rect(w0, h0)
        x, y, w, h = r0
        # rect1 nested inside rect0 (like real Haar features)
        w1 = max(1, w // 2)
        h1 = max(1, h // 2)
        r1 = (x + int(rng.integers(0, w - w1 + 1)),
              y + int(rng.integers(0, h - h1 + 1)), w1, h1)
        rects = [r0, r1, (0, 0, 0, 0)]
        weights = [-1.0 / (w * h),
                   float(rng.uniform(1.5, 3.0)) / (w1 * h1), 0.0]
        if not use_tilt and rng.random() < 0.25:
            r2 = (x, y, max(1, w // 3), max(1, h // 3))
            rects[2] = r2
            weights[2] = float(rng.uniform(-2.0, 2.0)) / (r2[2] * r2[3])
        thr = float(rng.normal(0.0, 0.02))
        return rects, weights, use_tilt, thr

    for s in range(n_stages):
        ncl = int(rng.integers(1, 4))
        st_ofs.append(len(clf_ofs))
        st_cnt.append(ncl)
        for c in range(ncl):
            is_cart = cart and rng.random() < 0.5
            n0 = len(nodes)
            clf_ofs.append(n0)
            alpha_ofs.append(len(alphas))
            if is_cart:
                # depth-2: node0 -> (node1, node2), leaves alpha0..3
                clf_cnt.append(3)
                for k, (lf, rt) in enumerate([(1, 2), (0, -1), (-2, -3)]):
                    rects, weights, ut, thr = rand_node()
                    nodes.append((rects, weights, ut, thr, lf, rt))
                alphas.extend(rng.uniform(0.0, 1.0, 4).tolist())
            else:
                clf_cnt.append(1)
                rects, weights, ut, thr = rand_node()
                nodes.append((rects, weights, ut, thr, 0, -1))
                alphas.extend(rng.uniform(0.0, 1.0, 2).tolist())
        # pass threshold low enough that a decent fraction survives
        st_thr.append(float(0.25 * ncl))

    n = len(nodes)
    spec = CascadeSpec(
        name="prop_cascade",
        window_w=w0, window_h=h0,
        rect_x=np.array([[r[0] for r in nd[0]] for nd in nodes], np.int16),
        rect_y=np.array([[r[1] for r in nd[0]] for nd in nodes], np.int16),
        rect_w=np.array([[r[2] for r in nd[0]] for nd in nodes], np.int16),
        rect_h=np.array([[r[3] for r in nd[0]] for nd in nodes], np.int16),
        rect_weight=np.array([nd[1] for nd in nodes], np.float32),
        tilted=np.array([nd[2] for nd in nodes], bool),
        node_threshold=np.array([nd[3] for nd in nodes], np.float32),
        left=np.array([nd[4] for nd in nodes], np.int32),
        right=np.array([nd[5] for nd in nodes], np.int32),
        clf_node_ofs=np.array(clf_ofs, np.int32),
        clf_node_cnt=np.array(clf_cnt, np.int32),
        clf_alpha_ofs=np.array(alpha_ofs, np.int32),
        alphas=np.array(alphas, np.float32),
        stage_clf_ofs=np.array(st_ofs, np.int32),
        stage_clf_cnt=np.array(st_cnt, np.int32),
        stage_threshold=np.array(st_thr, np.float32),
        stage_parent=np.full(n_stages, -1, np.int32),
        stage_next=np.full(n_stages, -1, np.int32),
        stage_child=np.full(n_stages, -1, np.int32),
    )
    assert spec.n_nodes == n
    return spec


CASES = [
    dict(seed=11, n_stages=1, cart=False, tilted=False),   # degenerate
    dict(seed=22, n_stages=4, cart=False, tilted=False),   # stumps
    dict(seed=33, n_stages=3, cart=True, tilted=False),    # CART mix
    dict(seed=44, n_stages=3, cart=False, tilted=True),    # tilted mix
    dict(seed=55, n_stages=4, cart=True, tilted=True),     # everything
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"s{c['seed']}" for c in CASES])
def test_random_cascade_roundtrip_and_parity(case):
    rng = np.random.default_rng(case["seed"])
    spec = _random_spec(rng, case["n_stages"], case["cart"],
                        case["tilted"])

    # (a) XML write -> parse round trip
    rt = parse_haar_xml_bytes(haar_xml_bytes(spec), name=spec.name)
    for f in ("rect_x", "rect_y", "rect_w", "rect_h", "tilted", "left",
              "right", "clf_node_ofs", "clf_node_cnt", "clf_alpha_ofs",
              "stage_clf_ofs", "stage_clf_cnt", "stage_parent",
              "stage_next", "stage_child"):
        assert np.array_equal(getattr(spec, f), getattr(rt, f)), f
    for f in ("rect_weight", "node_threshold", "alphas",
              "stage_threshold"):
        assert np.allclose(getattr(spec, f), getattr(rt, f),
                           rtol=0, atol=1e-6), f

    # (b) compiled f64 pipeline vs the window-at-a-time oracle
    img = rng.integers(0, 256, (64, 80), np.uint8)
    import jax.numpy as jnp
    det = PyramidDetector(spec, img.shape, dtype=jnp.float64,
                          min_size=(18, 18))
    got, overflow = det.candidates(img)
    assert not overflow
    ref = detect_multi_scale_reference(img, spec, min_neighbors=0,
                                       min_size=(18, 18),
                                       mode="scale_image")
    g = set(map(tuple, np.asarray(got).tolist()))
    r = set(map(tuple, np.asarray(ref).tolist()))
    assert g == r, (f"{len(g - r)} extra, {len(r - g)} missing "
                    f"of {len(r)} oracle boxes")

    # (c) the scale-cascade engine too, on a couple of cases (the mode
    # rescales features with cvRound per scale — different rounding
    # corners than the resize pyramid)
    if case["seed"] in (22, 55):
        from clfacedetection_tpu.detect import ScaleCascadeDetector
        sc = ScaleCascadeDetector(spec, img.shape, dtype=jnp.float64,
                                  min_size=(18, 18))
        got_sc, ovf = sc.candidates(img)
        assert not ovf
        ref_sc = detect_multi_scale_reference(img, spec, min_neighbors=0,
                                              min_size=(18, 18),
                                              mode="scale_cascade")
        assert (set(map(tuple, np.asarray(got_sc).tolist()))
                == set(map(tuple, np.asarray(ref_sc).tolist())))
