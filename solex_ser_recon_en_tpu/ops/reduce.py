"""Streaming mean/max image over the frame axis.

reference: solex_util.py:174-188 — a Python frame loop accumulating a uint64
sum and an elementwise max, then ``(sum / FrameCount).astype(uint16)``.

TPU design: a single fused XLA reduction over an in-HBM frame slab.  The sum
is accumulated in int32 (exact for uint16 frames up to 2^15 frames: the
largest possible sum is 65535 * 32768 < 2^31), so the result matches the
reference's uint64 accumulation bit-for-bit after the final f64 division on
host.  For scans larger than HBM, ``MeanMaxAccumulator`` folds chunk partial
sums (int64 on host) so any length is exact.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=())
def _sum_max(frames: jax.Array) -> Tuple[jax.Array, jax.Array]:
    s = jnp.sum(frames.astype(jnp.int32), axis=0)
    m = jnp.max(frames, axis=0)
    return s, m


def mean_max(frames, frame_count: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Mean (uint16, truncated like the reference) and max (uint16) images.

    frames: (F, ih, iw) uint16 array (np or jax). frame_count defaults to F.
    """
    s, m = _sum_max(jnp.asarray(frames))
    n = frames.shape[0] if frame_count is None else frame_count
    mean = (np.asarray(s, dtype=np.float64) / n).astype(np.uint16)
    return mean, np.asarray(m)


class MeanMaxAccumulator:
    """Chunked accumulator for scans that stream through HBM."""

    def __init__(self):
        self._sum: np.ndarray | None = None
        self._max: np.ndarray | None = None
        self.count = 0

    def update(self, chunk) -> None:
        s, m = _sum_max(jnp.asarray(chunk))
        s = np.asarray(s, dtype=np.int64)
        m = np.asarray(m)
        if self._sum is None:
            self._sum, self._max = s, np.array(m)
        else:
            self._sum += s
            np.maximum(self._max, m, out=self._max)
        self.count += chunk.shape[0]

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._sum is None:
            raise ValueError("no frames accumulated")
        mean = (self._sum.astype(np.float64) / self.count).astype(np.uint16)
        return mean, self._max
