"""Canny edge detection on device.

reference: ellipse_to_circle.py:244-250 — skimage.feature.canny(sigma=2,
low/high thresholds derived from the image median) applied to the *flooded*
(binarised 0/65000) downscaled disk, so the consumer only needs the outline
of a high-contrast blob; sub-pixel agreement with skimage is not load-bearing
(the edge points feed an outlier-robust ellipse fit).

Implementation: Gaussian blur -> Sobel gradients -> quantised-direction
non-maximum suppression -> double threshold -> hysteresis by iterated
masked dilation (a bounded ``lax.while_loop``), all as XLA ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel_1d(sigma: float) -> np.ndarray:
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jax.Array, k: np.ndarray, axis: int) -> jax.Array:
    pad = [(0, 0)] * img.ndim
    r = len(k) // 2
    pad[axis] = (r, r)
    xp = jnp.pad(img, pad, mode="constant")
    kj = jnp.asarray(k)
    n = img.shape[axis]
    out = jnp.zeros_like(img)
    for i in range(len(k)):
        out = out + kj[i] * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
    return out


def _sobel(img: jax.Array):
    """ndi.sobel-compatible gradients with reflect borders."""
    smooth = np.array([1.0, 2.0, 1.0], dtype=np.float32)
    deriv = np.array([-1.0, 0.0, 1.0], dtype=np.float32)

    def sep(img, ky, kx):
        pad = jnp.pad(img, 1, mode="reflect")
        rows = sum(
            ky[i] * jax.lax.slice_in_dim(pad, i, i + img.shape[0], axis=0)
            for i in range(3)
        )
        return sum(
            kx[i] * jax.lax.slice_in_dim(rows, i, i + img.shape[1], axis=1)
            for i in range(3)
        )

    gy = sep(img, deriv, smooth)  # d/dy
    gx = sep(img, smooth, deriv)  # d/dx
    return gy, gx


@partial(jax.jit, static_argnames=("sigma",))
def canny(
    image: jax.Array,
    sigma: float = 2.0,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
) -> jax.Array:
    """Boolean edge map (H, W)."""
    img = image.astype(jnp.float32)
    k = _gaussian_kernel_1d(sigma)
    sm = _conv1d(_conv1d(img, k, 0), k, 1)
    # skimage compensates constant-padding bleed by dividing by the blurred
    # support mask
    ones = jnp.ones_like(img)
    norm = _conv1d(_conv1d(ones, k, 0), k, 1)
    sm = sm / jnp.maximum(norm, 1e-12)

    gy, gx = _sobel(sm)
    mag = jnp.hypot(gy, gx)

    # non-maximum suppression over 4 quantised gradient directions
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    ang = jnp.where(ang < 0, ang + jnp.pi, ang)  # [0, pi)
    sector = jnp.floor_divide(ang + jnp.pi / 8, jnp.pi / 4).astype(jnp.int32) % 4

    pad = jnp.pad(mag, 1, mode="constant")

    def nb(dy, dx):
        return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), mag.shape)

    neighbours = [
        (nb(0, 1), nb(0, -1)),    # sector 0: horizontal gradient
        (nb(1, 1), nb(-1, -1)),   # sector 1: diagonal
        (nb(1, 0), nb(-1, 0)),    # sector 2: vertical
        (nb(1, -1), nb(-1, 1)),   # sector 3: anti-diagonal
    ]
    keep = jnp.zeros(mag.shape, bool)
    for s, (a, b) in enumerate(neighbours):
        keep = jnp.where((sector == s) & (mag >= a) & (mag >= b), True, keep)
    # exclude the one-pixel border (skimage erodes the support mask)
    border = jnp.zeros(mag.shape, bool).at[1:-1, 1:-1].set(True)
    # tiny absolute magnitude floor, same as ops/canny_host.py: a CONSTANT
    # image's support-mask division leaves backend-dependent f32 rounding
    # ripple (exactly zero on XLA:CPU, not guaranteed elsewhere); real limb
    # gradients are thousands, so this only silences the degenerate flat
    # case (edge-free input must yield no edges on every backend)
    keep = keep & border & (mag > 1e-3)

    low = keep & (mag >= low_threshold)
    high = keep & (mag >= high_threshold)

    # hysteresis: grow `high` through `low` until a fixed point
    def dilate(m):
        p = jnp.pad(m, 1, mode="constant")
        acc = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc | jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), m.shape)
        return acc

    def cond(state):
        cur, grown = state
        return jnp.any(cur != grown)

    def body(state):
        cur, _ = state
        nxt = dilate(cur) & low
        return nxt, cur

    init = (dilate(high) & low, high)
    final, _ = jax.lax.while_loop(cond, body, init)
    return final
