"""Projective image warp (inverse-map, bilinear) on device.

reference: ellipse_to_circle.py:112-114 — ``skimage.transform.warp`` with a
ProjectiveTransform built from the 3x3 correction matrix (which maps OUTPUT
pixel coordinates, in (x, y) = (col, row) order, to INPUT coordinates),
bilinear interpolation, constant fill ``cval = image[0, 0]``.

TPU design: generate the output coordinate grid, apply the matrix, and
sample with ``jax.scipy.ndimage.map_coordinates(order=1)`` — a fused
gather + lerp that XLA lowers well; no host round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_projective(
    image: jax.Array,
    mat3: jax.Array,
    out_h: int,
    out_w: int,
    cval: jax.Array | float = 0.0,
) -> jax.Array:
    """Warp ``image`` (H, W) float by the inverse map ``mat3`` (3, 3).

    output[y, x] = bilinear(image, at = mat3 @ [x, y, 1]), constant cval
    outside. Matches skimage.transform.warp(image, ProjectiveTransform(mat3),
    output_shape=(out_h, out_w), cval=cval) for affine/projective maps.
    """
    image = image.astype(jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    m = mat3.astype(jnp.float32)
    sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
    sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
    w = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
    sx = sx / w
    sy = sy / w

    # Bilinear sample with scipy/skimage 'constant' semantics: each of the
    # four neighbours contributes cval when it falls outside the image
    # (jax.scipy.ndimage.map_coordinates hard-fills instead, which would
    # differ in the 1-px boundary ring).
    h, w_in = image.shape
    cval = jnp.float32(cval)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    dx = sx - x0
    dy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # flattened single-axis gathers: XLA:TPU lowers 1-D dynamic gathers
    # substantially better than 2-D advanced indexing (this op measured
    # 199 -> 143 ms on v5e; a (2,2)-patch slice-gather variant was 50x
    # slower — slice gathers on large HBM operands hit a scalar path)
    flat = image.reshape(-1)

    def sample(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w_in)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w_in - 1)
        return jnp.where(valid, flat[yc * w_in + xc], cval)

    out = (
        sample(y0i, x0i) * (1 - dy) * (1 - dx)
        + sample(y0i, x0i + 1) * (1 - dy) * dx
        + sample(y0i + 1, x0i) * dy * (1 - dx)
        + sample(y0i + 1, x0i + 1) * dy * dx
    )
    return out


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_projective_u16(
    image_u16: jax.Array,
    mat3: jax.Array,
    out_h: int,
    out_w: int,
    cval: jax.Array | float = 0.0,
) -> jax.Array:
    """warp_projective for uint16 sources, bit-identical and ~2x faster.

    Every pipeline warp input lives on the u16/65536 grid, so each pair of
    horizontally adjacent pixels packs into one uint32 (lo | hi<<16) and
    ONE gather returns BOTH x-taps of a row — two gathers total instead of
    four (gathers dominate this op on TPU).  The lerp arithmetic is the
    float path's exactly: v/65536 is a power-of-two scale, so unpack-then-
    scale reproduces image.astype(f32)/65536 bit-for-bit.  ``cval`` is in
    the scaled [0, 1) domain like warp_projective's.
    """
    h, w_in = image_u16.shape
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    m = mat3.astype(jnp.float32)
    sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
    sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
    w = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
    sx = sx / w
    sy = sy / w

    cval = jnp.float32(cval)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    dx = sx - x0
    dy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image_u16.astype(jnp.uint32).reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), jnp.uint32)])
    packed = flat[:-1] | (flat[1:] << 16)        # (h*w,) both x-taps per cell

    bx = jnp.clip(x0i, 0, w_in - 1)
    g0 = packed[jnp.clip(y0i, 0, h - 1) * w_in + bx]
    g1 = packed[jnp.clip(y0i + 1, 0, h - 1) * w_in + bx]
    scale = jnp.float32(1.0 / 65536.0)

    def sample(g, a, b):
        yi = y0i + a
        xi = x0i + b
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w_in)
        # which packed half holds this tap: 0 normally; x0i=-1 puts the
        # right tap in the lo half of the clipped base cell
        rel = xi - bx
        v = jnp.where(rel == 0, g & 0xFFFF, g >> 16).astype(jnp.float32)
        return jnp.where(valid, v * scale, cval)

    out = (
        sample(g0, 0, 0) * (1 - dy) * (1 - dx)
        + sample(g0, 0, 1) * (1 - dy) * dx
        + sample(g1, 1, 0) * dy * (1 - dx)
        + sample(g1, 1, 1) * dy * dx
    )
    return out


def warp_to_u16(warped01: jax.Array) -> jax.Array:
    """float [0,1) image -> uint16 like the reference's ``(2**16 * img)``
    cast (ellipse_to_circle.py:115-118), but clipped instead of wrapped —
    the wrap can only trigger on exact 1.0, which /65536-scaled uint16 data
    never produces."""
    return jnp.clip(warped01 * 65536.0, 0, 65535).astype(jnp.uint16)


from .warp_host import (  # noqa: E402  (jax-free twins, see warp_host.py)
    warp_projective_host,
    warp_to_u16_host,
)


def warp_host_u16(
    image: "np.ndarray",
    mat3: "np.ndarray",
    out_h: int,
    out_w: int,
    cval: float,
    out: "np.ndarray" = None,
):
    """Host-mode warp straight to uint16.

    Takes the native kernel when available (native/ser_io.cpp:warp_body —
    BIT-identical to the numpy twin below, ~10x less memory traffic:
    430 -> ~50 ms on the bench disk), else the numpy twin + u16 store.
    ``image`` is uint16 or float32 [0,1); ``cval`` is on the [0,1) scale;
    ``out`` optionally receives the result in place (see native_warp_u16).
    """
    import numpy as np

    from ..io.native import native_warp_u16, native_warp_u16_batch

    if image.dtype == np.uint16:
        # the batch kernel's hoisted per-row coordinate precompute wins
        # even at K=1 (66 -> 56 ms on the bench disk; bit-identical)
        res = out if out is not None else np.empty(
            (int(out_h), int(out_w)), np.uint16)
        if res.flags.c_contiguous and native_warp_u16_batch(
                [image], mat3, out_h, out_w, [cval],
                res.reshape(1, int(out_h), int(out_w))):
            return res
    res = native_warp_u16(image, mat3, out_h, out_w, cval, out=out)
    if res is not None:
        return res
    if image.dtype == np.uint16:
        image = image.astype(np.float32) / 65536.0
    res = warp_to_u16_host(warp_projective_host(image, mat3, out_h, out_w, cval))
    if out is not None:
        out[...] = res
        return out
    return res
