"""Transversalium (row-gain striping) correction.

reference: solex_util.py:383-516 (correct_transversalium2), :277-354
(apply_lin_filter, the "stubborn" variant) and :357-375 (fix_edge_effect).

Algorithm: inside the fitted circle, the log-ratio of adjacent row strips
measures the per-row gain steps; a Savitzky-Golay smooth separates the true
brightness trend from the striping; the cumulative detrended log-ratio,
exponentiated and Tukey-tapered at the band edges, is the per-row gain fix.

TPU split: the image-sized work (masked per-row robust log-ratio means, the
final row multiply, the stubborn variant's big mean filters) runs on device
(ops/rowstats.py, ops/filters.py); the (H,)-length vector work (savgol,
cumsum, taper) stays on host in float64 where scipy gives exact reference
semantics.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from scipy.signal import savgol_filter

from ..ops.filters import mean_filter_hole, mean_filter_line
from ..ops.rowstats import apply_row_gain, row_log_ratio_stats, strip_mask


def tukey_taper(n: int, a: float = 0.05) -> np.ndarray:
    """The reference's Tukey taper (solex_util.py:456-470), vectorised."""
    x = np.arange(n, dtype=np.float64)
    x = np.minimum(x, n - x)  # fold: t(x) = t(N - x) for x > N/2
    ramp = 0.5 * (1 - np.cos(2 * np.pi * x / (a * n)))
    return np.where(x < a * n / 2, ramp, 1.0)


def _row_band(circle, borders) -> Tuple[int, int]:
    y1 = math.ceil(max(circle[1] - circle[2], borders[1]))
    y2 = math.floor(min(circle[1] + circle[2], borders[3]))
    return y1, y2


def _gain_from_mean_r(
    mean_r: np.ndarray, y1: int, y2: int, h: int, trans_strength: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(H,)-vector host math shared by the single and batched paths:
    savgol detrend + cumsum + Tukey taper (reference solex_util.py:396-470)."""
    # reference builds y_ratios_r = [0] + [rows y1+1 .. y2-1]
    y_ratios_r = np.zeros(y2 - y1, dtype=np.float64)
    y_ratios_r[1:] = mean_r[y1 + 1 : y2]

    n = len(y_ratios_r)
    if n < 7:
        return np.ones(h), np.ones(n)

    window = min(trans_strength, n // 2 * 2 - 1)
    trend = savgol_filter(y_ratios_r, window, 3)
    detrended = y_ratios_r - trend
    detrended -= np.mean(detrended)
    correction = np.exp(-np.cumsum(detrended))

    correction_t = 1.0 + (correction - 1.0) * tukey_taper(n)
    c = np.ones(h, dtype=np.float64)
    c[y1:y2] = correction_t
    return c, correction


def _strip_bounds_host(h: int, w: int, circle, borders,
                       row0: int = 0, row1: int = None):
    """Interval form of the strip mask: (row_ok (R,), x_lo (R,), x_hi (R,))
    int32 chord bounds per row, same float32 geometry as
    ops/rowstats.strip_mask.  The mask rows are chords, so the interval
    carries the mask exactly (x_lo/x_hi are integral ceil/floor results and
    columns are integers, making `xs >= x_lo` ⟺ `j >= int(x_lo)`)."""
    if row1 is None:
        row1 = h
    cx, cy, r = (np.float32(circle[0]), np.float32(circle[1]),
                 np.float32(circle[2]))
    bx0, by1, bx2, by3 = (np.float32(b) for b in borders)
    ys = np.arange(row0, row1, dtype=np.float32)
    y1 = np.ceil(max(cy - r, by1))
    y2 = np.floor(min(cy + r, by3))
    d2 = r * r - (ys - cy) ** 2
    dx = np.floor(np.sqrt(np.maximum(d2, np.float32(0.0))))
    x_lo = np.ceil(np.maximum(cx - dx, bx0))
    x_hi = np.floor(np.minimum(cx + dx, bx2))
    row_ok = (ys > y1) & (ys < y2) & (d2 >= 0.0)
    lo = np.clip(x_lo, 0, w).astype(np.int32)
    hi = np.clip(x_hi, 0, w).astype(np.int32)
    return row_ok, lo, hi


def _strip_mask_host(h: int, w: int, circle, borders,
                     row0: int = 0, row1: int = None) -> np.ndarray:
    """numpy twin of ops/rowstats.strip_mask (same float32 geometry).

    ``row0``/``row1`` restrict the returned mask to that row slice (the
    per-row geometry is row-independent, so mask[row0:row1] of the full
    call is returned bit-for-bit) — the gain consumer only reads the
    correction band, so the host path never materialises the full-frame
    mask."""
    row_ok, lo, hi = _strip_bounds_host(h, w, circle, borders, row0, row1)
    xs = np.arange(w, dtype=np.int32)
    return (row_ok[:, None]
            & (xs[None, :] >= lo[:, None])
            & (xs[None, :] < hi[:, None]))


def _masked_row_median_host(x: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """numpy twin of ops/rowstats._masked_row_median — EXACT semantics:
    invalid entries pushed to +inf, NaNs (0/0 pixels) sort last and stay
    counted in n (np.nanmedian would silently drop them, diverging from
    the device program by up to 1e-3 in the gain — observed).

    Negative result (round 3): a native nth_element selection kernel
    measured ~60 ms vs ~43 ms for this full-sort form on the bench disk —
    numpy's AVX-512 row sort beats scalar selection; the kernel was
    removed (docs/PERF.md)."""
    big = np.where(valid, x, np.float32(np.inf))
    s = np.sort(big, axis=1)
    n = valid.sum(axis=1)
    lo_i = np.maximum((n - 1) // 2, 0)
    hi_i = np.maximum(n // 2, 0)
    rows = np.arange(x.shape[0])
    med = 0.5 * (s[rows, lo_i] + s[rows, hi_i])
    return np.where(n > 0, med, np.float32(0.0)).astype(np.float32)


def _row_stats_host(img: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """numpy twin of ops/rowstats.row_log_ratio_stats (mean_r only).

    Used with the CPU-only product fast path (products.host_products_
    enabled): the XLA program's per-row masked-median sorts cost ~1.4 s
    on this host's single core where the numpy form takes ~0.5 s.
    Mirrors the device code step for step in float32 so both paths agree
    to reduction-order rounding.
    """
    f = img.astype(np.float32)
    prev = np.concatenate([f[:1], f[:-1]], axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        rat = np.log(f / prev).astype(np.float32)
    rat = np.where(valid, rat, np.float32(0.0))

    with np.errstate(invalid="ignore"):  # inf-inf on all-masked rows
        med = _masked_row_median_host(rat, valid)
        d = np.abs(rat - med[:, None])
        mdev = _masked_row_median_host(d, valid)
        s = np.where(mdev[:, None] > 0,
                     d / np.maximum(mdev[:, None], np.float32(1e-30)),
                     np.float32(0.0))
        keep = valid & (s < 2.0)
    nk = keep.sum(axis=1)
    total = np.where(keep, rat, np.float32(0.0)).sum(axis=1,
                                                     dtype=np.float32)
    return np.where(nk > 0, total / np.maximum(nk, 1), 0.0)


def _row_stats_host_fast(img: np.ndarray, row_ok: np.ndarray,
                         x_lo: np.ndarray, x_hi: np.ndarray) -> np.ndarray:
    """_row_stats_host with the median/MAD selections in the native kernel
    (io/native.native_row_medstats) — BIT-identical result: the log-ratio
    input and the final pairwise kept-sum stay in numpy, the kernel only
    replaces the two full-width row sorts with per-row O(W) selections of
    the same order statistics (fuzz-tested equal).  Falls back to the pure
    numpy twin when the native lib is unavailable."""
    f = img.astype(np.float32, copy=False)
    # log ratio without the predecessor-row concat copy: rat[i] = f[i]/f[i-1]
    # via views, row 0 against itself — elementwise-identical to the twin's
    # np.log(f / concat([f[:1], f[:-1]])) at a third of the temp traffic
    rat = np.empty_like(f)
    with np.errstate(divide="ignore", invalid="ignore"):
        np.divide(f[1:], f[:-1], out=rat[1:])
        np.divide(f[0], f[0], out=rat[0])
        np.log(rat, out=rat)
    from ..io.native import native_row_medstats

    out = native_row_medstats(rat, row_ok, x_lo, x_hi)
    if out is None:  # no native lib: rebuild the boolean mask and go numpy
        xs = np.arange(img.shape[1], dtype=np.int32)
        valid = (np.asarray(row_ok)[:, None]
                 & (xs[None, :] >= np.asarray(x_lo)[:, None])
                 & (xs[None, :] < np.asarray(x_hi)[:, None]))
        return _row_stats_host(img, valid)
    value, nk = out
    total = value.sum(axis=1, dtype=np.float32)
    return np.where(nk > 0, total / np.maximum(nk, 1), 0.0)


def transversalium_gain(
    img: np.ndarray,
    circle,
    borders,
    trans_strength: int,
) -> Tuple[np.ndarray, int, int, np.ndarray]:
    """Per-row gain vector c (H,) and the correction band [y1, y2).

    Returns (c, y1, y2, correction_raw) where correction_raw is the
    un-tapered correction over the band (used by the stubborn variant).
    """
    from .products import host_products_enabled

    h, w = img.shape
    if host_products_enabled():
        # the gain consumer (_gain_from_mean_r) reads mean_r[y1+1:y2]
        # only, and the row stats are row-independent (medians across
        # each row; rat[i] needs just row i-1 as the ratio predecessor),
        # so compute them on the band's row slice alone — bit-identical
        # to the full-frame stats (test_row_stats_band_crop_exact).
        # Columns stay full-width: cropping them changes each row's
        # pairwise-sum tree and perturbs the f32 kept-sum by ~1e-8.
        y1b, y2b = _row_band(circle, borders)
        a, b = max(y1b, 0), min(y2b, h)
        mean_r = np.zeros(h, dtype=np.float64)
        if b - a >= 2:
            row_ok, lo, hi = _strip_bounds_host(h, w, circle, borders,
                                                row0=a, row1=b)
            sub = _row_stats_host_fast(np.asarray(img[a:b]), row_ok, lo, hi)
            mean_r[a + 1:b] = sub[1:]
    else:
        valid, _, _ = strip_mask(
            h,
            w,
            jnp.asarray(np.asarray(circle, dtype=np.float32)),
            jnp.asarray(np.asarray(borders, dtype=np.float32)),
        )
        _, mean_r = row_log_ratio_stats(jnp.asarray(img), valid)
        mean_r = np.asarray(mean_r, dtype=np.float64)

    y1, y2 = _row_band(circle, borders)
    y1 = max(y1, 0)
    y2 = min(y2, h)
    c, correction = _gain_from_mean_r(mean_r, y1, y2, h, trans_strength)
    return c, y1, y2, correction


def fix_edge_effect(mult: np.ndarray, circle, linlen: int) -> np.ndarray:
    """Zero/extend the stubborn multiplier outside the disk circle.

    reference: solex_util.py:357-375 — vectorised over rows instead of the
    Python loop; identical per-row semantics (zero outside the chord, hold
    the value half a window in from each limb, skip rows narrower than
    linlen).
    """
    h, w = mult.shape
    cx, cy, r = circle[0], circle[1], circle[2]
    y1 = math.ceil(max(cy - r, 0))
    y2 = math.floor(min(cy + r, h - 1))
    halflen = linlen // 2
    out = np.array(mult, dtype=np.float64)
    out[:y1, :] = 0
    out[y2 + 1 :, :] = 0
    ys = np.arange(h)
    band = (ys >= y1) & (ys < y2)
    d2 = r * r - (ys - cy) ** 2
    dx = np.floor(np.sqrt(np.maximum(d2, 0.0)))
    x2v = np.floor(np.minimum(cx + dx, w - 1)).astype(int)
    x1v = np.ceil(np.maximum(cx - dx, 0)).astype(int)
    xs = np.arange(w)[None, :]
    bandm = band[:, None]
    out[bandm & ((xs < x1v[:, None]) | (xs >= x2v[:, None]))] = 0
    wide = band & (x2v - x1v >= linlen)
    left_src = np.clip(x1v + halflen, 0, w - 1)
    right_src = np.clip(x2v - halflen - 1, 0, w - 1)
    left_vals = out[ys, left_src][:, None]
    right_vals = out[ys, right_src][:, None]
    fill_left = wide[:, None] & (x1v[:, None] > 0) & (xs >= x1v[:, None]) & (
        xs < x1v[:, None] + halflen
    )
    fill_right = (
        wide[:, None]
        & (x2v[:, None] < w - 1)
        & (xs >= x2v[:, None] - halflen)
        & (xs < x2v[:, None])
    )
    out = np.where(fill_left, left_vals, out)
    out = np.where(fill_right, right_vals, out)
    return out


def stubborn_filter(
    img: np.ndarray,
    spurious: np.ndarray,
    y1: int,
    y2: int,
    circle,
    linlen: int = 101,
    half_width: int = 5,
) -> np.ndarray:
    """The stubborn-transversalium image filter.

    reference: solex_util.py:277-354 (apply_lin_filter, live path only —
    the reference's result/result2 intermediates are dead code).
    """
    # host float64 math (a device array's .astype(f64) silently yields f32)
    img = np.asarray(img)
    logimg = np.log(np.maximum(img.astype(np.float64), 1e-12))

    # fill spurious rows with the mean of the nearest good rows above/below
    filt2 = logimg.copy()
    prev = np.zeros(img.shape[1])
    for i in range(img.shape[0]):
        if spurious[i]:
            filt2[i, :] = prev / 2
        else:
            prev = filt2[i, :]
    prev = np.zeros(img.shape[1])
    for i in range(img.shape[0] - 1, -1, -1):
        if spurious[i]:
            filt2[i, :] += prev / 2
        else:
            prev = filt2[i, :]

    # host_ops: in full-host mode these run the same jitted programs on
    # XLA:CPU — the readbacks below must not cross a dead downlink
    from ..utils.placement import host_ops

    with host_ops():
        result3 = np.asarray(
            mean_filter_hole(jnp.asarray(filt2), linlen, half_width))
        result4 = np.asarray(mean_filter_line(jnp.asarray(logimg), linlen))
    delta = result4 - result3

    n = y2 - y1
    c = np.zeros(img.shape[0])
    c[y1:y2] = tukey_taper(n)

    delta = fix_edge_effect(delta, circle, linlen + 20)
    out = img.astype(np.float64) * np.exp(-delta * c.reshape(-1, 1))
    return np.minimum(out, 65535).astype(np.uint16)


def transversalium_gains_batched(
    stack,
    circle,
    borders,
    trans_strength: int = 301,
) -> np.ndarray:
    """Per-shift row-gain vectors (K, H) for a Doppler sweep.

    All sweep shifts share the correction geometry (circle/borders — the
    reference fits once at i=0 and reuses it, Solex_recon.py:105-133), so
    the per-image row statistics run as ONE vmapped device program; only
    the tiny (H,)-vector savgol/cumsum stays a host loop.  The caller fuses
    the row multiply into its own program (products.products_core_batched).
    """
    import jax

    from .products import host_products_enabled

    if host_products_enabled():
        stack_np = np.asarray(stack)
        K, h, w = stack_np.shape
        # band-crop like transversalium_gain: the gain consumer reads
        # mean_r[y1+1:y2] only and the row stats are row-independent
        # (test_row_stats_band_crop_exact), so the K per-shift stats run
        # on the correction band's rows alone
        y1b, y2b = _row_band(circle, borders)
        a, b = max(y1b, 0), min(y2b, h)
        mean_r_all = np.zeros((K, h), dtype=np.float64)
        if b - a >= 2:
            row_ok, lo, hi = _strip_bounds_host(h, w, circle, borders,
                                                row0=a, row1=b)
            for k in range(K):
                sub = _row_stats_host_fast(stack_np[k, a:b], row_ok, lo, hi)
                mean_r_all[k, a + 1:b] = sub[1:]
    else:
        stack_j = jnp.asarray(stack)
        K, h, w = stack_j.shape
        valid, _, _ = strip_mask(
            h,
            w,
            jnp.asarray(np.asarray(circle, dtype=np.float32)),
            jnp.asarray(np.asarray(borders, dtype=np.float32)),
        )
        _, mean_r_all = jax.vmap(
            lambda im: row_log_ratio_stats(im, valid)
        )(stack_j)
        mean_r_all = np.asarray(mean_r_all, dtype=np.float64)

    y1, y2 = _row_band(circle, borders)
    y1 = max(y1, 0)
    y2 = min(y2, h)
    return np.stack([
        _gain_from_mean_r(mean_r_all[k], y1, y2, h, trans_strength)[0]
        for k in range(K)
    ])


def correct_transversalium_batched(
    stack,
    circle,
    borders,
    trans_strength: int = 301,
):
    """Doppler-sweep transversalium applied: returns
    (stack_out (K,H,W) uint16 device array, gains (K,H) float64)."""
    import jax

    stack_j = jnp.asarray(stack)
    gains = transversalium_gains_batched(
        stack_j, circle, borders, trans_strength
    )
    out = jax.vmap(apply_row_gain)(stack_j, jnp.asarray(gains, dtype=jnp.float32))
    return out, gains


def correct_transversalium(
    img: np.ndarray,
    circle,
    borders,
    trans_strength: int = 301,
    stubborn: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply the transversalium correction; returns (uint16 image, gain c).

    reference: solex_util.py:383-516.  When no circle is available the
    caller passes the backup band as in Solex_recon.py:145-146.
    """
    c, y1, y2, correction = transversalium_gain(img, circle, borders, trans_strength)

    if stubborn:
        logc = np.log(np.maximum(correction, 1e-300))
        thresh = np.std(logc) * 2.5
        flag = np.zeros(img.shape[0], dtype=bool)
        band_flag = np.abs(logc) > thresh
        flag[y1:y2] = band_flag
        flag = flag | np.roll(flag, -1) | np.roll(flag, 1)
        out = stubborn_filter(img, flag, y1, y2, circle)
        return out, c

    from .products import host_products_enabled

    if host_products_enabled():
        # full-host mode (CPU product core): the downstream stages (crop,
        # products) are host-side, so the row multiply must NOT place the
        # disk on the accelerator — on a dead-downlink relay the next
        # stage's np.asarray would stall for minutes on the readback.
        # Bit-identical to apply_row_gain: same float32 multiply/clip/cast.
        out_h = (np.asarray(img, dtype=np.float32)
                 * np.asarray(c, dtype=np.float32)[:, None])
        return np.clip(out_h, 0, 65535).astype(np.uint16), c

    # stays a device array — downstream stages (crop, products) are
    # device-side; callers download only for file writes
    out = apply_row_gain(jnp.asarray(img), jnp.asarray(c, dtype=np.float32))
    return out, c
