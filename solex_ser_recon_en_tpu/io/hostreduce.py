"""Host-side streaming mean/max (feed-policy fallback).

On hosts where the accelerator link is slower than local memory (this
sandbox's relay sustains ~20-40 MB/s against a ~1 GB/s host), shipping the
whole slab to HBM just to compute two reductions is the wrong trade: pass A
runs here as vectorised numpy over memmap chunks (C-speed, one read), and
only the narrow spectral band pass B needs is transferred (io/feeder.py
band path).  On normally-attached TPUs the device path wins and is chosen
by the feed policy probe.

Matches ops/reduce semantics bit-for-bit (uint64 sum, reference truncation).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .ser import SerReader


def host_mean_max(r: SerReader, chunk_frames: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """Normalised-orientation mean/max of a SER scan, computed on host."""
    h, w = r.header.height, r.header.width
    acc = np.zeros((h, w), dtype=np.uint64)
    mx = np.zeros((h, w), dtype=r.header.dtype)
    for start in range(0, r.frame_count, chunk_frames):
        n = min(chunk_frames, r.frame_count - start)
        raw = r.raw_frames(start, n)
        acc += raw.sum(axis=0, dtype=np.uint64)
        np.maximum(mx, raw.max(axis=0), out=mx)
    if r.flag_rotate:
        acc = np.rot90(acc)
        mx = np.rot90(mx)
    scale = 256 if r.header.pixel_depth == 8 else 1
    mean = ((acc.astype(np.float64) * scale) / r.frame_count).astype(np.uint16)
    mx16 = mx.astype(np.uint16)
    if r.header.pixel_depth == 8:
        mx16 = mx16 << 8
    return mean, np.ascontiguousarray(mx16)


def spectral_band(
    fit_floor: np.ndarray, shifts, iw: int, margin: int = 2
) -> Tuple[int, int]:
    """Smallest spectral column range [x0, x1) the recon gathers from.

    reference consumer indices: clip(floor + shift, 0, iw-2) and +1
    (solex_util.py:113-119).
    """
    shifts = np.asarray(list(shifts), dtype=np.int64)
    lo = int(np.clip(fit_floor.min() + shifts.min(), 0, iw - 2)) - margin
    hi = int(np.clip(fit_floor.max() + shifts.max(), 0, iw - 2)) + 1 + 1 + margin
    return max(0, lo), min(iw, hi)


def extract_band(r: SerReader, x0: int, x1: int, start: int, count: int) -> np.ndarray:
    """Raw-layout band slab (count, ...) restricted to spectral cols [x0, x1).

    For wide-stored scans the spectral axis is the raw ROW axis; for tall
    storage it is the raw column axis.  Returns a contiguous copy (the
    transfer source).
    """
    raw = r.raw_frames(start, count)
    if r.flag_rotate:
        # raw (F, iw_spectral, W_spatial): spectral = axis 1
        return np.ascontiguousarray(raw[:, x0:x1, :])
    # raw (F, H_spatial, iw_spectral): spectral = axis 2
    return np.ascontiguousarray(raw[:, :, x0:x1])
