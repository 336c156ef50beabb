"""Stream compaction: flat, hierarchical, and (on TPU) the Pallas kernel
must agree exactly — indices of the first `cap` set bits in raster order,
padding with len(mask), and the true total count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clfacedetection_tpu.detect.pyramid import _compact, _compact_hier


def _ref(mask, cap):
    idx = np.flatnonzero(mask)
    n = len(idx)
    out = np.full(cap, mask.size, np.int64)
    out[:min(cap, n)] = idx[:cap]
    return out, n


@pytest.mark.parametrize("seed,rate,cap", [
    (0, 0.01, 256), (1, 0.2, 512), (2, 0.0005, 128), (3, 0.01, 4096),
])
def test_compact_matches_reference(seed, rate, cap):
    rng = np.random.default_rng(seed)
    mask = rng.random(50_000) < rate
    ref_idx, ref_n = _ref(mask, cap)
    idx, n = _compact(jnp.asarray(mask), cap)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    assert int(n) == ref_n


@pytest.mark.parametrize("seed,rate", [(0, 0.01), (1, 0.08), (2, 0.0002)])
def test_hier_matches_flat(seed, rate):
    rng = np.random.default_rng(seed)
    mask = rng.random(200_000) < rate
    cap = 4096
    fi, fn = _compact(jnp.asarray(mask), cap)
    hi, hn = _compact_hier(jnp.asarray(mask), cap)
    n_true = int(np.count_nonzero(mask))
    if int(hn) <= cap:  # no overflow: exact agreement required
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(fi))
        assert int(hn) == int(fn) == n_true
    else:               # overflow reported so callers retry with larger cap
        assert n_true > cap or int(hn) > cap


@pytest.mark.parametrize("seed,rate", [(0, 0.01), (1, 0.08)])
def test_hier_pinned_capb_matches_default(seed, rate):
    """compact_capb decouples the alive-block bound from cap (round 5:
    the cap//4 default under-provisions scattered survivors and the
    overflow silently 4x-regrows the cap — docs/PERF.md tail section).
    A pinned capb that covers the alive blocks must be result-identical
    to the default; one that does NOT must signal overflow (n > cap) so
    the caller's regrowth fires rather than silently truncating."""
    rng = np.random.default_rng(seed)
    mask = rng.random(200_000) < rate
    cap = 8192
    di, dn = _compact_hier(jnp.asarray(mask), cap)
    npad = -(-mask.size // 128) * 128
    padded = np.concatenate([mask, np.zeros(npad - mask.size, bool)])
    blocks = np.count_nonzero(padded.reshape(-1, 128).any(axis=1))
    pi, pn = _compact_hier(jnp.asarray(mask), cap, capb=blocks)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(di))
    assert int(pn) == int(dn)
    if blocks > 1:
        _, on = _compact_hier(jnp.asarray(mask), cap, capb=blocks - 1)
        assert int(on) > cap


def test_hier_empty_and_full():
    mask = np.zeros(10_000, bool)
    idx, n = _compact_hier(jnp.asarray(mask), 128)
    assert int(n) == 0 and int(idx[0]) == mask.size
    mask[:] = True
    idx, n = _compact_hier(jnp.asarray(mask), 128)
    assert int(n) >= 128  # overflow signalled
    np.testing.assert_array_equal(np.asarray(idx), np.arange(128))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel")
def test_pallas_kernel_matches():
    from clfacedetection_tpu.ops.compact_kernel import build_compact_kernel
    rng = np.random.default_rng(5)
    H, W = 531, 433
    mask = rng.random((H, W)) < 0.01
    cap = 4096
    run = build_compact_kernel(H, W, cap)
    idx, n = jax.jit(run)(jnp.asarray(mask))
    ref_idx, ref_n = _compact(jnp.asarray(mask.reshape(-1)), cap)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    assert int(n) == int(ref_n)
