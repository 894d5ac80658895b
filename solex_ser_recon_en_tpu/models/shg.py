"""The flagship model: one fused device step of SHG reconstruction.

``shg_forward`` is the jittable heart of the pipeline — streaming
mean/max + multi-shift MXU reconstruction in a single XLA program over an
in-HBM frame slab (reference hot path: solex_util.py:93-144,174-188).  The
host-side fits (spectral line, ellipse) happen *between* invocations of
device programs; this function is what the accelerator actually spends its
time in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.placement import tpu_placement


@jax.jit
def shg_forward_xla(frames: jax.Array, ind_l: jax.Array, left_w: jax.Array):
    """Pure-XLA step: separate reductions + one-hot MXU recon.

    HBM-bound (the recon materialises an f32 slab for the matmul) but
    shift-count independent — the fastest path for large Doppler sweeps."""
    from ..ops.recon import _recon_onehot

    s = jnp.sum(frames.astype(jnp.int32), axis=0)
    mean = (s // frames.shape[0]).astype(jnp.uint16)
    mx = jnp.max(frames, axis=0)
    disks = _recon_onehot(frames, ind_l, left_w, iw=frames.shape[2])
    return mean, mx, disks


def shg_forward(frames: jax.Array, ind_l: jax.Array, left_w: jax.Array):
    """frames (F, ih, iw) u16, ind_l (S, ih) i32, left_w (ih,) f32
    -> (mean u16 (ih, iw), max u16 (ih, iw), disks u16 (S, ih, F)).

    Kernel selection (measured on v5e, 2000x2048x300 slab, honest
    host-checksum sync): the fused single-HBM-pass Pallas kernel with the
    lane-windowed mask contraction (ops/fused_pallas.py) wins at every S
    when the shift taps fit a narrow window — they always do for real
    spectral-line fits (22.8 vs 30.5 ms XLA at S=2; 28.3 vs 29.6 ms at
    S=7).  When the indices force the full-width contraction (pathological
    fits only), per-shift cost scales with S, so large sweeps fall back to
    the S-independent one-hot matmul.  An in-kernel MXU mask contraction
    was measured slower at every S (docs/PERF.md negative result)."""
    if tpu_placement():
        from ..ops.fused_pallas import (
            _window_for_indices, shg_fused_pallas,
        )

        S = ind_l.shape[0]
        win = 0
        try:
            win = _window_for_indices(
                np.asarray(ind_l), frames.shape[2], 128
            )
        except Exception:
            win = 0
        if win or S <= 4:
            return shg_fused_pallas(frames, ind_l, left_w)
    return shg_forward_xla(frames, ind_l, left_w)


def example_inputs(
    F: int = 64, ih: int = 256, iw: int = 128, S: int = 2, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 65536, size=(F, ih, iw), dtype=np.uint16)
    curve = iw / 2 + 0.01 * np.arange(ih)
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    from ..ops.recon import build_shift_indices

    ind_l, left_w = build_shift_indices(floor, frac, list(range(S)), iw)
    return frames, ind_l, left_w
