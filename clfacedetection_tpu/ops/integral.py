"""Grayscale conversion + integral images (sum / squared-sum / tilted).

TPU-native re-design of the reference's ``clif`` module (``clif.cl`` +
``clif.cpp``): where the reference runs one OpenCL work-item per row then per
column with serial scans (``clif.cl:79-120``), here the scans are expressed
as XLA ``cumsum``/``lax.scan`` programs over whole images (batched, jittable,
differentiable-by-construction shapes).

Numeric design (the reference's ``clif.cl:91`` uses a 32-bit ``sum_square``
and overflows; its column pass writes the plain sum into the sqsum output,
``clif.cl:113-118`` — both defects documented in SURVEY.md C2):

* ``sum``: int32. Exact — max value 255 * 4M pixels < 2^31.
* squared sum: **two int32 planes** ``sq_hi = (p*p) >> 8`` and
  ``sq_lo = (p*p) & 0xFF``. Each plane's total stays < 2^31 for any image up
  to ~8 MPx, so 4-corner window differences are *exact integers*; the
  combined window value ``hi * 256 + lo`` is reconstructed in float only
  after the (exact) cancellation — avoiding both the reference's uint32
  overflow and float64 on the TPU.
* ``tilted``: int32 rotated integral (RSAT), matching ``cv2.integral``'s
  values bit-for-bit including OpenCV's left-column convention
  ``T(y,0) = T(y-1,1)``.

All outputs are (H+1, W+1) with a zero first row/column, exactly like
``cv2.integral`` / the reference layout (``clif.cl:76-99``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bgr_to_gray", "bgr_to_gray_per_row", "bgra_to_gray", "IntegralImages",
    "integral_images", "tilted_integral", "invert",
]


def invert(img: "jax.Array") -> "jax.Array":
    """255 - pixel, any layout (the reference's demo-leftover ``invert``
    kernel, clif.cl:123-137 — included for capability parity)."""
    import jax.numpy as _jnp
    return (_jnp.asarray(255, img.dtype) - img)

# OpenCV's fixed-point BGR->gray coefficients (R, G, B) — cvtColor
# semantics, the CPU path the reference demo actually uses for detection
# (clif.cpp:247-250 use_opencl=false -> cvCvtColor). Modern OpenCV (>= 4.x)
# uses 15-bit fixed point; verified bit-exact vs cv2 5.0 on 65k pixels.
_CV_SHIFT = 15
_CV_R, _CV_G, _CV_B = 9798, 19235, 3735  # round(0.299/0.587 * 2^15), B = rest


def bgr_to_gray(img: jax.Array, mode: str = "cv") -> jax.Array:
    """Convert a uint8 BGR image (..., H, W, 3) to uint8 grayscale (..., H, W).

    mode="cv":   OpenCV ``cvtColor(BGR2GRAY)`` fixed-point rounding —
                 bit-exact vs cv2 (used for detection parity).
    mode="clif": the reference GPU kernel's semantics — float32
                 mac + truncation toward zero (``clif.cl:4-18``).
    """
    if img.ndim < 3 or img.shape[-1] != 3:
        raise ValueError(
            f"bgr_to_gray expects (..., H, W, 3) BGR input, got {img.shape}")
    b = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    r = img[..., 2].astype(jnp.int32)
    if mode == "cv":
        y = (r * _CV_R + g * _CV_G + b * _CV_B + (1 << (_CV_SHIFT - 1))) >> _CV_SHIFT
        return y.astype(jnp.uint8)
    elif mode == "clif":
        y = (0.114 * b.astype(jnp.float32)
             + 0.587 * g.astype(jnp.float32)
             + 0.299 * r.astype(jnp.float32))
        y = jnp.clip(y.astype(jnp.int32), 0, 255)  # C-style trunc + clamp
        return y.astype(jnp.uint8)
    raise ValueError(f"unknown grayscale mode {mode!r}")


def bgr_to_gray_per_row(img: jax.Array, mode: str = "clif") -> jax.Array:
    """Row-parallel grayscale — twin of the reference's per-row-vectorized
    ``bgrToGrayscalePerRow`` (clif.cl:35-74): one OpenCL work-item per row,
    the row processed as manual-SIMD ``uchar4`` chunks.  On TPU the manual
    SIMD dimension is the VPU lane axis, so the idiomatic equivalent maps
    one *row* per scan step with the row's pixels vectorized across lanes
    (``lax.map`` over rows).  Numerically identical to :func:`bgr_to_gray`
    — the reference variant computes the same float mac + truncation as
    its per-pixel kernel, just four pixels at a time."""
    if img.ndim < 3 or img.shape[-1] != 3:
        raise ValueError(
            f"bgr_to_gray_per_row expects (..., H, W, 3), got {img.shape}")
    if img.ndim > 3:
        return jax.vmap(lambda f: bgr_to_gray_per_row(f, mode))(img)
    return jax.lax.map(lambda row: bgr_to_gray(row[None], mode=mode)[0],
                       img)


def bgra_to_gray(img: jax.Array, mode: str = "cv") -> jax.Array:
    """uint8 BGRA (..., H, W, 4) -> uint8 grayscale; alpha ignored.

    Capability twin of the reference's ``bgraToGrayscale`` (clif.cl:20-33).
    That kernel is unused (never registered, clif.cpp:94) and broken three
    ways — its coefficient vector initializer is a C comma expression that
    evaluates to 0 (clif.cl:2), it applies the RGB-ordered coefficients to
    BGR-ordered channels, and it indexes a ``uchar4*`` with byte-style
    offsets — so the *intent* (grayscale of the first three channels) is
    implemented here with correct semantics instead: identical to
    :func:`bgr_to_gray` on ``img[..., :3]`` (matching
    ``cvtColor(BGRA2GRAY)``, which uses the BGR coefficients and ignores
    alpha).  The reference's per-row-vectorized variant has its own twin,
    :func:`bgr_to_gray_per_row`.
    """
    if img.ndim < 3 or img.shape[-1] != 4:
        raise ValueError(
            f"bgra_to_gray expects (..., H, W, 4) BGRA input, got "
            f"{img.shape}")
    return bgr_to_gray(img[..., :3], mode=mode)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IntegralImages:
    """Integral-image bundle for one (or a batch of) grayscale frame(s).

    Shapes are (..., H+1, W+1); all planes int32 and exact (see module doc).
    ``tilted`` is None unless requested (only cascades with 45-degree
    features need it — cf. has_tilted_features, tempcv.cpp:324).
    """

    sum: jax.Array                    # int32
    sq_hi: jax.Array                  # int32, integral of (p*p) >> 8
    sq_lo: jax.Array                  # int32, integral of (p*p) & 0xFF
    tilted: Optional[jax.Array] = None  # int32 RSAT

    @property
    def height(self) -> int:
        return self.sum.shape[-2] - 1

    @property
    def width(self) -> int:
        return self.sum.shape[-1] - 1

    def sqsum_f64(self) -> np.ndarray:
        """Reconstruct the float64 sqsum integral (cv2.integral layout) on
        host — for test oracles only."""
        hi = np.asarray(self.sq_hi, dtype=np.float64)
        lo = np.asarray(self.sq_lo, dtype=np.float64)
        return hi * 256.0 + lo


def _integral_2d(x: jax.Array) -> jax.Array:
    """(..., H, W) int32 -> (..., H+1, W+1) int32 inclusive 2-D prefix sum
    with zero first row/col."""
    s = jnp.cumsum(jnp.cumsum(x, axis=-1, dtype=jnp.int32), axis=-2,
                   dtype=jnp.int32)
    pad = [(0, 0)] * (s.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


@partial(jax.jit, static_argnames=("with_tilted",))
def integral_images(gray: jax.Array, with_tilted: bool = False) -> IntegralImages:
    """Compute the integral-image bundle from uint8 grayscale (..., H, W)."""
    p = gray.astype(jnp.int32)
    p2 = p * p
    out_sum = _integral_2d(p)
    out_hi = _integral_2d(p2 >> 8)
    out_lo = _integral_2d(p2 & 0xFF)
    tilted = tilted_integral(gray) if with_tilted else None
    return IntegralImages(sum=out_sum, sq_hi=out_hi, sq_lo=out_lo,
                          tilted=tilted)


@jax.jit
def tilted_integral(gray: jax.Array) -> jax.Array:
    """45-degree rotated integral image (RSAT), bit-exact vs ``cv2.integral``.

    Recurrence (derived from the triangle geometry; validated element-wise
    against cv2 including OpenCV's left-column convention):

        U(y, x) = U(y-1, x+1) + p(y-1, x-1) + p(y-2, x-1)
        T(y, x) = T(y-1, x-1) + U(y, x)
        T(y, 0) = T(y-1, 1)

    The x-axis is padded by H on the right so the leftward-shifting U
    carries never hit the boundary; implemented as one ``lax.scan`` over
    rows with full-width vector ops per step (VPU lanes), the idiomatic
    TPU replacement for the reference's one-work-item-per-row serial scan
    (clif.cl:79-99). Corner-offset mapping consumers: tempcv.cpp:743-750.
    """
    if gray.ndim > 2:
        return jax.vmap(tilted_integral)(gray)
    H, W = gray.shape
    P = W + H + 2
    p = jnp.zeros((H, P), jnp.int32).at[:, :W].set(gray.astype(jnp.int32))
    p_prev = jnp.vstack([jnp.zeros((1, P), jnp.int32), p[:-1]])  # p(y-2) rows

    def step(carry, rows):
        U, T_prev = carry
        row1, row2 = rows
        U = (jnp.concatenate([U[1:], jnp.zeros((1,), jnp.int32)])
             + jnp.concatenate([jnp.zeros((1,), jnp.int32), row1[:-1]])
             + jnp.concatenate([jnp.zeros((1,), jnp.int32), row2[:-1]]))
        T = jnp.concatenate([jnp.zeros((1,), jnp.int32), T_prev[:-1]]) + U
        T = T.at[0].set(T_prev[1])
        return (U, T), T

    U0 = jnp.zeros((P,), jnp.int32)
    T0 = jnp.zeros((P,), jnp.int32)
    (_, _), T_rows = jax.lax.scan(step, (U0, T0), (p, p_prev))
    T_full = jnp.vstack([T0[None, :], T_rows])
    return T_full[:, :W + 1]
