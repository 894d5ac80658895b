"""De-vignetting.

reference: solex_util.py:590-654 (removeVignette) — 85th-percentile profiles
along both axes inside the circle (shrunk 65 px), savgol trends, axis-ratio
curve, NaN forward/backward fill, gaussian smooth, per-row multiply.

TPU split: the image-sized percentiles run on device; the (H,)-vector trend
math on host (scipy float64, as the reference).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter1d
from scipy.signal import savgol_filter

import jax


@jax.jit
def _axis_percentiles(img: jax.Array):
    f = img.astype(jnp.float32)
    return (
        jnp.percentile(f, 85.0, axis=0),
        jnp.percentile(f, 85.0, axis=1),
    )


def remove_vignette(frame: np.ndarray, circle) -> np.ndarray:
    """Returns the de-vignetted frame (float64, like the reference).

    ``circle`` is the fitted (cx, cy, r) from the ellipse step; without a
    valid circle the caller must skip (Solex_recon.py:125-128).
    """
    from ..utils.placement import host_ops

    # host_ops: in full-host mode the percentiles run the same jitted
    # program on XLA:CPU — the readback must not cross a dead downlink
    with host_ops():
        y_arr, y_arr2 = (np.asarray(a, dtype=np.float64)
                         for a in _axis_percentiles(jnp.asarray(frame)))
    shrink = 65
    start1 = max(0, int(circle[0] - circle[2] + shrink))
    end1 = min(y_arr.shape[0], int(circle[0] + circle[2] + 1 - shrink))
    start2 = max(0, int(circle[1] - circle[2] + shrink))
    end2 = min(y_arr2.shape[0], int(circle[1] + circle[2] + 1 - shrink))

    y1 = y_arr[start1:end1]
    y2 = y_arr2[start2:end2]
    x1 = np.arange(y1.shape[0]) + start1 - int(circle[0])
    x2 = np.arange(y2.shape[0]) + start2 - int(circle[1])

    if y1.shape[0] < 20 or y2.shape[0] < 20:
        return frame  # not enough data (reference :606-608)

    scale_pix = int(min(y1.shape[0] // 2.75, y2.shape[0] // 2.75)) // 2 * 2 - 1
    trend1 = savgol_filter(y1, min(801, scale_pix), 3)
    trend2 = savgol_filter(y2, min(801, scale_pix), 3)

    mm = min(np.min(x1), np.min(x2))
    width = int(max(np.max(x1), np.max(x2)) - mm + 1)
    prof1 = np.full(width, np.nan)
    prof2 = np.full(width, np.nan)
    offsets = np.arange(width) + mm
    prof1[int(x1[0] - mm) : int(x1[-1] - mm + 1)] = trend1
    prof2[int(x2[0] - mm) : int(x2[-1] - mm + 1)] = trend2

    ratio_axes = prof1 / prof2
    ratio_axes[prof1 == 0] = np.nan
    ratio_axes[prof2 == 0] = np.nan

    correction = np.full(frame.shape[0], np.nan)
    idx = offsets.astype(int) + int(circle[1])
    ok = (idx >= 0) & (idx < frame.shape[0])
    correction[idx[ok]] = ratio_axes[ok]
    # forward then backward fill
    for i in range(1, len(correction)):
        if np.isnan(correction[i]):
            correction[i] = correction[i - 1]
    for i in range(len(correction) - 2, -1, -1):
        if np.isnan(correction[i]):
            correction[i] = correction[i + 1]
    if np.isnan(correction).any():
        return frame
    correction = gaussian_filter1d(correction, max(2, min(150, scale_pix // 4)))
    return frame * correction.reshape((-1, 1))
