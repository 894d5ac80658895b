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


@jax.jit
def _fold(sum_acc, max_acc, chunk):
    s = sum_acc + jnp.sum(chunk.astype(jnp.int32), axis=0)
    m = jnp.maximum(max_acc, jnp.max(chunk, axis=0))
    return s, m


class MeanMaxAccumulator:
    """Chunked accumulator for scans that stream through HBM.

    Accumulation stays on device (one jitted fold per chunk, no host
    round-trips — a per-chunk download would serialise the feed pipeline);
    the single download happens in ``result``.  int32 is exact up to 2^15
    frames of uint16; longer scans spill to an int64 host fold per 2^15
    frames.
    """

    _SPILL = 1 << 15

    def __init__(self):
        self._sum = None
        self._max = None
        self._spill: np.ndarray | None = None  # int64 host overflow guard
        self._since_spill = 0
        self.count = 0

    def _do_spill(self) -> None:
        s = np.asarray(self._sum, dtype=np.int64)
        self._spill = s if self._spill is None else self._spill + s
        self._sum = jnp.zeros_like(self._sum)
        self._since_spill = 0

    def update(self, chunk) -> None:
        chunk = jnp.asarray(chunk)
        if self._sum is None:
            shape = chunk.shape[1:]
            self._sum = jnp.zeros(shape, jnp.int32)
            self._max = jnp.zeros(shape, jnp.uint16)
        # a single chunk longer than the spill window would overflow the
        # int32 fold on its own — split it
        for start in range(0, chunk.shape[0], self._SPILL):
            part = chunk[start : start + self._SPILL]
            if self._since_spill + part.shape[0] > self._SPILL:
                self._do_spill()
            self._sum, self._max = _fold(self._sum, self._max, part)
            self._since_spill += part.shape[0]
            self.count += part.shape[0]

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._sum is None:
            raise ValueError("no frames accumulated")
        total = np.asarray(self._sum, dtype=np.int64)
        if self._spill is not None:
            total = total + self._spill
        mean = (total.astype(np.float64) / self.count).astype(np.uint16)
        return mean, np.asarray(self._max)
