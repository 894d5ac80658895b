"""Masked per-row robust statistics for the transversalium correction.

reference: solex_util.py:383-395 — a Python loop over image rows computing,
inside the fitted solar circle, the MAD-outlier-rejected mean of the
row-pair log ratio (reject_outliers at solex_util.py:76-86, m=2).

TPU design: one vectorised pass — build the inside-circle mask from the
circle/border geometry, compute all log-ratios at once, and get per-row
masked medians via a single row-sorted tensor (masked entries pushed to
+inf), then the rejected mean as a masked average.  No Python row loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _masked_row_median(x: jax.Array, valid: jax.Array) -> jax.Array:
    """np.median per row over the valid entries (average of middles)."""
    big = jnp.where(valid, x, jnp.float32(jnp.inf))
    s = jnp.sort(big, axis=1)
    n = jnp.sum(valid, axis=1)  # (H,)
    lo_i = jnp.maximum((n - 1) // 2, 0)
    hi_i = jnp.maximum(n // 2, 0)
    lo = jnp.take_along_axis(s, lo_i[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(s, hi_i[:, None], axis=1)[:, 0]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, 0.0)


@partial(jax.jit, static_argnums=(0, 1))
def strip_mask(
    h: int, w: int, circle: jax.Array, borders: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Inside-circle row strips intersected with borders.

    Returns (valid (H, W) bool, y1, y2) where valid[y] covers
    x in [ceil(max(cx-dx, bx0)), floor(min(cx+dx, bx2))) for rows
    y1 < y < y2, dx = floor(sqrt(r^2-(y-cy)^2))  (solex_util.py:384-391).
    """
    cx, cy, r = circle[0], circle[1], circle[2]
    bx0, by1, bx2, by3 = borders[0], borders[1], borders[2], borders[3]
    y1 = jnp.ceil(jnp.maximum(cy - r, by1))
    y2 = jnp.floor(jnp.minimum(cy + r, by3))
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    d2 = r * r - (ys - cy) ** 2
    dx = jnp.floor(jnp.sqrt(jnp.maximum(d2, 0.0)))
    x_lo = jnp.ceil(jnp.maximum(cx - dx, bx0))       # (H,)
    x_hi = jnp.floor(jnp.minimum(cx + dx, bx2))      # (H,) exclusive
    row_ok = (ys > y1) & (ys < y2) & (d2 >= 0.0)
    valid = (
        row_ok[:, None]
        & (xs[None, :] >= x_lo[:, None])
        & (xs[None, :] < x_hi[:, None])
    )
    return valid, y1.astype(jnp.int32), y2.astype(jnp.int32)


@jax.jit
def row_log_ratio_stats(img: jax.Array, valid: jax.Array):
    """Per-row (mean, MAD-rejected mean) of log(img[y]/img[y-1]).

    Matches the reference loop body (solex_util.py:388-395): for every row y
    with a valid strip, rat = log(strip_y / strip_{y-1});
    y_ratios[y] = mean(rat); y_ratios_r[y] = mean(reject_outliers(rat, m=2)).
    Rows with no valid pixels return 0 (the loop never visits them).
    """
    f = img.astype(jnp.float32)
    prev = jnp.concatenate([f[:1], f[:-1]], axis=0)
    rat = jnp.log(f / prev)
    rat = jnp.where(valid, rat, 0.0)

    n = jnp.sum(valid, axis=1)
    mean_all = jnp.where(n > 0, jnp.sum(rat, axis=1) / jnp.maximum(n, 1), 0.0)

    med = _masked_row_median(rat, valid)
    d = jnp.abs(rat - med[:, None])
    mdev = _masked_row_median(d, valid)
    s = jnp.where(mdev[:, None] > 0, d / jnp.maximum(mdev[:, None], 1e-30), 0.0)
    keep = valid & (s < 2.0)
    nk = jnp.sum(keep, axis=1)
    mean_r = jnp.where(
        nk > 0,
        jnp.sum(jnp.where(keep, rat, 0.0), axis=1) / jnp.maximum(nk, 1),
        0.0,
    )
    return mean_all, mean_r


@jax.jit
def apply_row_gain(img: jax.Array, gain: jax.Array) -> jax.Array:
    """img * gain[:, None], clipped to uint16.

    reference: solex_util.py:489,515-516.
    """
    out = img.astype(jnp.float32) * gain.astype(jnp.float32)[:, None]
    return jnp.clip(out, 0, 65535).astype(jnp.uint16)
