"""Canny edge detection, bit-exact with OpenCV (aperture 3, L1 gradient).

Needed for the CV_HAAR_DO_CANNY_PRUNING detection flag: the reference
computes ``cvCanny(img, 0, 50, 3)`` once per frame and prunes windows whose
edge density is too low (tempcv.cpp:1339-1343, 1386-1405).

Semantics reverse-engineered from OpenCV and verified bit-exact against
``cv2.Canny`` over random and smoothed images at multiple thresholds:

* Sobel 3x3 dx/dy with replicate borders; magnitude |dx| + |dy| (L1).
* Non-maximum suppression with the TG22 fixed-point sector test
  (TG22 = 13573 = tan(22.5) in Q15): horizontal sectors compare
  (>, >=) against left/right, vertical (>, >=) against up/down, diagonal
  strictly (>) against both diagonal neighbors chosen by sign(dx^dy);
  out-of-image neighbor magnitudes are ZERO (borders can be edges).
* Hysteresis: candidates are NMS survivors with mag > low; edges are the
  8-connected flood of {candidates with mag > high} — computed as an
  iterate-to-fixpoint dilation, which is order-independent and therefore
  equals OpenCV's stack-based fill exactly.

The NumPy twin is the specification; the JAX version matches it
element-for-element (shared arithmetic, ``lax.while_loop`` hysteresis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["canny", "canny_np"]

_TG22 = 13573  # tan(22.5 deg) * 2^15


def _sobel_np(img: np.ndarray):
    p = np.pad(img.astype(np.int32), 1, mode="edge")
    H, W = img.shape
    kx = ((-1, 0, 1), (-2, 0, 2), (-1, 0, 1))
    ky = ((-1, -2, -1), (0, 0, 0), (1, 2, 1))
    dx = sum(kx[i][j] * p[i:i + H, j:j + W]
             for i in range(3) for j in range(3) if kx[i][j])
    dy = sum(ky[i][j] * p[i:i + H, j:j + W]
             for i in range(3) for j in range(3) if ky[i][j])
    return dx, dy


def canny_np(img: np.ndarray, low: float, high: float) -> np.ndarray:
    """NumPy Canny; returns uint8 {0, 255} like cv2.Canny."""
    H, W = img.shape
    dx, dy = _sobel_np(img)
    mag = np.abs(dx) + np.abs(dy)
    low_i, high_i = int(np.floor(low)), int(np.floor(high))
    mp = np.pad(mag, 1)

    def nb(di, dj):
        return mp[1 + di:1 + di + H, 1 + dj:1 + dj + W]

    x = np.abs(dx)
    y = np.abs(dy) << 15
    horiz = y < x * _TG22
    vert = y > x * _TG22 + ((2 * x) << 15)
    s_pos = (dx ^ dy) >= 0
    okh = (mag > nb(0, -1)) & (mag >= nb(0, 1))
    okv = (mag > nb(-1, 0)) & (mag >= nb(1, 0))
    d1 = np.where(s_pos, nb(-1, -1), nb(-1, 1))
    d2 = np.where(s_pos, nb(1, 1), nb(1, -1))
    okd = (mag > d1) & (mag > d2)
    cand = (mag > low_i) & np.where(horiz, okh, np.where(vert, okv, okd))
    edges = cand & (mag > high_i)
    while True:
        ep = np.pad(edges, 1)
        grown = np.zeros_like(edges)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di or dj:
                    grown |= ep[1 + di:1 + di + H, 1 + dj:1 + dj + W]
        new = edges | (grown & cand)
        if (new == edges).all():
            return (edges.astype(np.uint8)) * 255
        edges = new


def canny(img: jax.Array, low: float, high: float) -> jax.Array:
    """JAX Canny on uint8 (H, W); returns uint8 {0, 255}."""
    H, W = img.shape
    p = jnp.pad(img.astype(jnp.int32), 1, mode="edge")

    def tap(i, j):
        return p[i:i + H, j:j + W]

    dx = (tap(0, 2) - tap(0, 0)) + 2 * (tap(1, 2) - tap(1, 0)) \
        + (tap(2, 2) - tap(2, 0))
    dy = (tap(2, 0) - tap(0, 0)) + 2 * (tap(2, 1) - tap(0, 1)) \
        + (tap(2, 2) - tap(0, 2))
    mag = jnp.abs(dx) + jnp.abs(dy)
    low_i, high_i = int(np.floor(low)), int(np.floor(high))
    mp = jnp.pad(mag, 1)

    def nb(di, dj):
        return mp[1 + di:1 + di + H, 1 + dj:1 + dj + W]

    x = jnp.abs(dx)
    y = jnp.abs(dy) << 15
    horiz = y < x * _TG22
    vert = y > x * _TG22 + ((2 * x) << 15)
    s_pos = (dx ^ dy) >= 0
    okh = (mag > nb(0, -1)) & (mag >= nb(0, 1))
    okv = (mag > nb(-1, 0)) & (mag >= nb(1, 0))
    d1 = jnp.where(s_pos, nb(-1, -1), nb(-1, 1))
    d2 = jnp.where(s_pos, nb(1, 1), nb(1, -1))
    okd = (mag > d1) & (mag > d2)
    cand = (mag > low_i) & jnp.where(horiz, okh, jnp.where(vert, okv, okd))
    seeds = cand & (mag > high_i)

    def grow(edges):
        ep = jnp.pad(edges, 1)
        g = jnp.zeros_like(edges)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di or dj:
                    g = g | ep[1 + di:1 + di + H, 1 + dj:1 + dj + W]
        return edges | (g & cand)

    def cond(state):
        edges, changed = state
        return changed

    def body(state):
        edges, _ = state
        new = grow(edges)
        return new, jnp.any(new != edges)

    edges, _ = jax.lax.while_loop(cond, body, (seeds, jnp.asarray(True)))
    return edges.astype(jnp.uint8) * 255
