"""Separable box blur with OpenCV-compatible semantics.

The reference leans on ``cv2.blur`` in several detection stages
(detect_bord solex_util.py:168, line blur :230, flood threshold
ellipse_to_circle.py:163, canny pre-threshold :241).  cv2.blur is a
normalised box filter with BORDER_REFLECT_101 edges and, for integer
images, round-half-to-even output.  We reproduce that on device as two
1-D cumulative-sum window filters.

Precision: for integer images both window sums run in int32, which is exact
for every kernel the pipeline uses (uint16 * kx * ky <= 65535*25*40 << 2^31);
the single normalising division happens once at the end, so results match
cv2 to the last rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _window_sum_1d(x: jax.Array, k: int, axis: int, acc_dtype) -> jax.Array:
    """Sliding-window sum of width k along axis with reflect-101 borders.

    Anchor matches cv2 (k//2 pixels to the left of the window end).
    """
    if k <= 1:
        return x.astype(acc_dtype)
    lo, hi = k // 2, k - 1 - k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    xp = jnp.pad(x, pad, mode="reflect")  # reflect == BORDER_REFLECT_101
    c = jnp.cumsum(xp.astype(acc_dtype), axis=axis)
    zshape = list(c.shape)
    zshape[axis] = 1
    c = jnp.concatenate([jnp.zeros(zshape, c.dtype), c], axis=axis)
    n = x.shape[axis]
    return jax.lax.slice_in_dim(c, k, k + n, axis=axis) - jax.lax.slice_in_dim(
        c, 0, n, axis=axis
    )


@partial(jax.jit, static_argnums=(1, 2))
def box_blur(img: jax.Array, kx: int, ky: int) -> jax.Array:
    """Box mean filter, kx columns wide x ky rows tall (cv2 ksize=(kx, ky)).

    Returns float32. Integer inputs use exact int32 window sums.
    """
    integer = jnp.issubdtype(img.dtype, jnp.integer)
    acc = jnp.int32 if integer else jnp.float32
    s = _window_sum_1d(img, ky, img.ndim - 2, acc)
    s = _window_sum_1d(s, kx, img.ndim - 1, acc)
    k = kx * ky
    if integer:
        # exact mean from int32 sums: a plain f32 cast of sums > 2^24
        # (kernels >= ~25x11 on uint16) loses the last bit before the
        # division; split into exact quotient + small remainder instead
        q = s // k
        r = s - q * k
        return q.astype(jnp.float32) + r.astype(jnp.float32) / jnp.float32(k)
    return s.astype(jnp.float32) / jnp.float32(k)


@partial(jax.jit, static_argnums=(1, 2))
def box_blur_u16(img: jax.Array, kx: int, ky: int) -> jax.Array:
    """uint16 box blur with cv2's round-half-to-even output."""
    out = box_blur(img, kx, ky)
    return jnp.clip(jnp.round(out), 0, 65535).astype(jnp.uint16)


# --- numpy twins (host path) ------------------------------------------------
# On tiny scans the XLA dispatch overhead of the two box blurs dominates the
# math (folder-batch profiling: ~1-2 ms per call on 256x96 frames where the
# arithmetic is ~50 us).  For INTEGER inputs the blur is exact int32 window
# sums + one deterministic quotient/remainder split, so the numpy twin below
# is BIT-identical to the device program (test_blur host-twin fuzz); float
# inputs keep the device path (cumsum order would differ).

import numpy as np


def _window_sum_1d_host(x: np.ndarray, k: int, axis: int,
                        acc_dtype) -> np.ndarray:
    if k <= 1:
        return x.astype(acc_dtype)
    lo, hi = k // 2, k - 1 - k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    xp = np.pad(x, pad, mode="reflect")
    c = np.cumsum(xp.astype(acc_dtype), axis=axis)
    zshape = list(c.shape)
    zshape[axis] = 1
    c = np.concatenate([np.zeros(zshape, c.dtype), c], axis=axis)
    n = x.shape[axis]
    sl_hi = [slice(None)] * c.ndim
    sl_lo = [slice(None)] * c.ndim
    sl_hi[axis] = slice(k, k + n)
    sl_lo[axis] = slice(0, n)
    return c[tuple(sl_hi)] - c[tuple(sl_lo)]


def box_blur_host(img: np.ndarray, kx: int, ky: int) -> np.ndarray:
    """numpy twin of box_blur for INTEGER inputs (bit-identical); float
    inputs raise (callers fall back to the device program).  2-D uint16
    images take the one-pass native kernel (same int32 window sums —
    integer addition is order-independent, so it is exact by
    construction and fuzz-tested bit-identical)."""
    if not np.issubdtype(img.dtype, np.integer):
        raise TypeError("box_blur_host is exact for integer inputs only")
    if img.dtype == np.uint16 and img.ndim == 2:
        from ..io.native import native_box_blur_u16

        out = native_box_blur_u16(img, kx, ky, want="f32")
        if out is not None:
            return out
    s = _window_sum_1d_host(img, ky, img.ndim - 2, np.int32)
    s = _window_sum_1d_host(s, kx, img.ndim - 1, np.int32)
    k = kx * ky
    q = s // k
    r = s - q * k
    return q.astype(np.float32) + r.astype(np.float32) / np.float32(k)


def box_blur_u16_host(img: np.ndarray, kx: int, ky: int) -> np.ndarray:
    if img.dtype == np.uint16 and img.ndim == 2:
        from ..io.native import native_box_blur_u16

        out = native_box_blur_u16(img, kx, ky, want="u16")
        if out is not None:
            return out
    out = box_blur_host(img, kx, ky)
    return np.clip(np.round(out), 0, 65535).astype(np.uint16)
