"""Bilinear uint8 resize with OpenCV 2.4 fixed-point semantics.

The scale-image pyramid mode downscales the frame once per level and
re-runs a fixed-size window over it (``cvResize(..., CV_INTER_LINEAR)`` at
reference tempcv.cpp:1302, followed by ``cvIntegral``).  Detection parity
therefore requires a *pinned* resize definition shared by the oracle and
the TPU path.

This module implements the classic OpenCV scalar fixed-point algorithm
(INTER_RESIZE_COEF_BITS = 11, the uchar specialization of
``VResizeLinear`` with its >>4 / >>16 / +2>>2 cast chain) in two exactly
matching forms:

* :func:`resize_bilinear_u8_np` — NumPy, used by the golden oracle;
* :func:`resize_bilinear_u8`    — JAX, used by the TPU pyramid detector
  (static gather indices, int32 arithmetic; batching over leading dims).

Note on cv2 5.0: its INTER_LINEAR HAL path rounds slightly differently
(verified by probe: single-axis weights behave as full-precision rounding,
but the separable composition disagrees by 1 LSB on ~0.06% of pixels).
Bit-exactness across OpenCV versions was never stable; the framework pins
the 2.4-era semantics (the version the reference project built against)
and tests <=1 LSB agreement with the installed cv2.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_coeffs", "resize_bilinear_u8", "resize_bilinear_u8_np"]

COEF_BITS = 11
COEF_SCALE = 1 << COEF_BITS  # 2048


def resize_coeffs(src: int, dst: int) -> Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Source index + 2-tap fixed-point weights for one axis.

    fx = (dx+0.5)*scale - 0.5 with border clamping (sx<0 -> fx=0;
    sx>=src-1 -> fx=1), coefficients cvRound(f * 2048) computed in float32
    like OpenCV's ``saturate_cast<short>(cbuf * INTER_RESIZE_COEF_SCALE)``.
    """
    scale = np.float64(src) / dst
    d = np.arange(dst, dtype=np.float64)
    fd = (d + 0.5) * scale - 0.5
    s = np.floor(fd).astype(np.int64)
    f = (fd - s).astype(np.float32)
    f = np.where(s < 0, np.float32(0), f)
    s = np.maximum(s, 0)
    f = np.where(s >= src - 1, np.float32(1), f)
    s = np.minimum(s, max(src - 2, 0))
    c0 = np.rint((np.float32(1) - f) * np.float32(COEF_SCALE)).astype(np.int32)
    c1 = np.rint(f * np.float32(COEF_SCALE)).astype(np.int32)
    return s.astype(np.int32), c0, c1


def resize_bilinear_u8_np(img: np.ndarray, out_hw: Tuple[int, int]):
    """NumPy twin of :func:`resize_bilinear_u8` (bit-identical)."""
    h2, w2 = out_hw
    h, w = img.shape[-2:]
    sx, cx0, cx1 = resize_coeffs(w, w2)
    sy, cy0, cy1 = resize_coeffs(h, h2)
    a = img.astype(np.int32)
    t = a[..., :, sx] * cx0 + a[..., :, np.minimum(sx + 1, w - 1)] * cx1
    r0 = t[..., sy, :] >> 4
    r1 = t[..., np.minimum(sy + 1, h - 1), :] >> 4
    val = ((cy0[:, None] * r0) >> 16) + ((cy1[:, None] * r1) >> 16)
    return np.clip((val + 2) >> 2, 0, 255).astype(np.uint8)


def resize_bilinear_u8(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Resize uint8 (..., H, W) to (..., h2, w2); static-index gathers plus
    int32 vector math (VPU work, no dynamic shapes)."""
    h2, w2 = out_hw
    h, w = img.shape[-2:]
    sx, cx0, cx1 = resize_coeffs(w, w2)
    sy, cy0, cy1 = resize_coeffs(h, h2)
    a = img.astype(jnp.int32)
    t = (jnp.take(a, sx, axis=-1) * cx0
         + jnp.take(a, np.minimum(sx + 1, w - 1), axis=-1) * cx1)
    r0 = jnp.take(t, sy, axis=-2) >> 4
    r1 = jnp.take(t, np.minimum(sy + 1, h - 1), axis=-2) >> 4
    val = ((cy0[:, None] * r0) >> 16) + ((cy1[:, None] * r1) >> 16)
    return jnp.clip((val + 2) >> 2, 0, 255).astype(jnp.uint8)
