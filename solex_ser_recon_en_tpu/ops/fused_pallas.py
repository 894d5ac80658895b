"""Pallas TPU kernel: fused single-pass mean + max + multi-shift recon.

The device-resident pipeline step (models/shg.py:shg_forward) is
HBM-bandwidth bound: XLA runs the mean/max reductions and the one-hot
matmul reconstruction as separate passes over the frame slab, and the
matmul path additionally materialises a float32 copy of the whole slab
for the MXU — ~4-7x the slab's bytes in HBM traffic.

This kernel reads each frame tile from HBM exactly ONCE and computes all
three results from the VMEM-resident tile:

    grid (ny, nf), f fastest:
      frames_ref (FB, YB, iw) u16   one HBM read per tile
      sum_ref    (YB, iw) i32       revisited across f steps (accumulator)
      max_ref    (YB, iw) i32       revisited across f steps
      disks_ref  (S, FB, YB) u16    disjoint per (f, y) tile

Per-shift extraction uses an iota-compare mask + lane reduction on the
VPU (two non-zero columns per row — reference hot loop semantics,
solex_util.py:113-134); the (S, YB) index block is tiny and VMEM-resident.
Accumulators are int32: 65535 * F_max(32767) < 2^31.

Numerics match ops/reduce (int sums) and ops/recon (f32 lerp, clip, u16
cast) exactly: the masked lane-reduce only adds exact +0.0 terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.placement import tpu_placement
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .recon import build_shift_indices


def _kernel(frames_ref, ind_ref, w_ref, sum_ref, max_ref, disks_ref,
            comb_ref):
    f_step = pl.program_id(1)
    fi = frames_ref[:].astype(jnp.int32)          # (FB, YB, iw)
    tile_sum = jnp.sum(fi, axis=0)                # (YB, iw)
    tile_max = jnp.max(fi, axis=0)

    @pl.when(f_step == 0)
    def _():
        sum_ref[:] = tile_sum
        max_ref[:] = tile_max
        # weighted shift masks depend only on the y tile: build once per
        # y sweep, reuse across all frame steps from VMEM scratch.
        # One mask per shift — w at the left column, 1-w at the right —
        # so extraction is a single multiply+lane-reduce per shift.
        yb, iw = tile_sum.shape
        S = ind_ref.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (yb, iw), 1)
        w = w_ref[0, :][:, None]                  # (YB, 1)
        for s in range(S):
            idx = ind_ref[s, :][:, None]          # (YB, 1)
            comb_ref[s, :, :] = jnp.where(cols == idx, w, 0.0) + jnp.where(
                cols == idx + 1, 1.0 - w, 0.0
            )

    @pl.when(f_step != 0)
    def _():
        sum_ref[:] = sum_ref[:] + tile_sum
        max_ref[:] = jnp.maximum(max_ref[:], tile_max)

    ff = fi.astype(jnp.float32)
    S = ind_ref.shape[0]
    for s in range(S):
        val = jnp.sum(ff * comb_ref[s, :, :][None, :, :], axis=2)  # (FB, YB)
        disks_ref[s, :, :] = (
            jnp.clip(val, 0, 65535).astype(jnp.int32).astype(jnp.uint16)
        )


def _kernel_win(frames_ref, ind_ref, w_ref, sum_ref, max_ref, disks_ref,
                comb_ref, base_ref, *, win: int):
    """Windowed variant of ``_kernel``: the shift indices inside one
    128-row y tile span only a few columns (the spectral-line fit is a
    smooth cubic, and the Doppler shifts are small offsets of it), so the
    per-shift mask contraction runs over a narrow lane-aligned window of
    the tile instead of the full (lane-padded) width — and the f32
    convert shrinks with it.  The dropped terms are all exact +0.0
    contributions (zero mask weight), so the result is bit-identical to
    the full-width kernel.  The caller VERIFIES (host-side, exact same
    base arithmetic) that every tile's taps fit the window and falls back
    to the full-width kernel otherwise."""
    f_step = pl.program_id(1)
    iw = frames_ref.shape[2]
    fi = frames_ref[:].astype(jnp.int32)          # (FB, YB, iw)
    tile_sum = jnp.sum(fi, axis=0)                # (YB, iw)
    tile_max = jnp.max(fi, axis=0)

    @pl.when(f_step == 0)
    def _():
        sum_ref[:] = tile_sum
        max_ref[:] = tile_max
        yb = tile_sum.shape[0]
        S = ind_ref.shape[0]
        idx_all = ind_ref[...]                    # (S, YB)
        # lane-aligned window base shared by all shifts of this y tile
        base = (jnp.clip(jnp.min(idx_all), 0, iw - win) // 128) * 128
        base_ref[0] = base
        cols = jax.lax.broadcasted_iota(jnp.int32, (yb, win), 1) + base
        w = w_ref[0, :][:, None]                  # (YB, 1)
        for s in range(S):
            idx = ind_ref[s, :][:, None]          # (YB, 1)
            comb_ref[s, :, :] = jnp.where(cols == idx, w, 0.0) + jnp.where(
                cols == idx + 1, 1.0 - w, 0.0
            )

    @pl.when(f_step != 0)
    def _():
        sum_ref[:] = sum_ref[:] + tile_sum
        max_ref[:] = jnp.maximum(max_ref[:], tile_max)

    # the stored base is 128-aligned by construction; Mosaic needs the
    # proof attached to the index to vector-load at a dynamic lane offset
    base = pl.multiple_of(base_ref[0], 128)
    # u16 -> i32 -> f32: Mosaic has no direct u16->f32 cast
    ffw = frames_ref[:, :, pl.ds(base, win)].astype(jnp.int32).astype(
        jnp.float32
    )
    S = ind_ref.shape[0]
    for s in range(S):
        val = jnp.sum(ffw * comb_ref[s, :, :][None, :, :], axis=2)  # (FB, YB)
        disks_ref[s, :, :] = (
            jnp.clip(val, 0, 65535).astype(jnp.int32).astype(jnp.uint16)
        )


def _kernel_mxu(frames_ref, ind_ref, w_ref, sum_ref, max_ref, disks_ref,
                comb_ref):
    """MXU variant: the per-shift extraction is one batched contraction.

    The VPU kernel above costs O(S·FB·YB·iw) mask-multiply work per tile —
    linear in the shift count, which is why models/shg.py crosses over to
    the XLA one-hot path at S≈5.  Here the (S, YB, iw) weighted-mask stack
    contracts against the frame tile on the MXU instead:

        disks[y, f, s] = Σ_x ff[f, y, x] · comb[s, y, x]

    a dot_general with x contracted and y batched.  Mosaic requires batch
    dims at position 0, so the frame tile is transposed to (YB, FB, iw)
    in-kernel (a leading-dims permute — the lane dim is untouched) and the
    mask scratch is built (YB, S, iw).  The disk output block is
    (YB, FB, S) — written untransposed (S is the lane dim and equals the
    full array dim, satisfying the Mosaic lane rule) and permuted to
    (S, ih, F) once outside the kernel.
    """
    f_step = pl.program_id(1)
    fi = frames_ref[:].astype(jnp.int32)          # (FB, YB, iw)
    tile_sum = jnp.sum(fi, axis=0)
    tile_max = jnp.max(fi, axis=0)

    @pl.when(f_step == 0)
    def _():
        sum_ref[:] = tile_sum
        max_ref[:] = tile_max
        yb, iw = tile_sum.shape
        S = ind_ref.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (yb, iw), 1)
        w = w_ref[0, :][:, None]
        for s in range(S):
            idx = ind_ref[s, :][:, None]
            comb_ref[:, s, :] = jnp.where(cols == idx, w, 0.0) + jnp.where(
                cols == idx + 1, 1.0 - w, 0.0
            )

    @pl.when(f_step != 0)
    def _():
        sum_ref[:] = sum_ref[:] + tile_sum
        max_ref[:] = jnp.maximum(max_ref[:], tile_max)

    # HIGHEST: full-f32 MXU passes, matching ops/recon._recon_onehot — the
    # default single bf16 pass loses ~2^-9 relative accuracy
    val = jax.lax.dot_general(
        jnp.transpose(fi.astype(jnp.float32), (1, 0, 2)), comb_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                             # (YB, FB, S)
    disks_ref[:] = (
        jnp.clip(val, 0, 65535).astype(jnp.int32).astype(jnp.uint16)
    )


@partial(jax.jit, static_argnames=("fb", "yb"))
def _shg_fused_mxu(frames, ind_l, left_w2, fb: int, yb: int):
    F, ih, iw = frames.shape
    S = ind_l.shape[0]
    nf = pl.cdiv(F, fb)
    ny = pl.cdiv(ih, yb)
    pad_f = nf * fb - F
    pad_y = ny * yb - ih
    if pad_f or pad_y:
        frames = jnp.pad(frames, ((0, pad_f), (0, pad_y), (0, 0)))
        ind_l = jnp.pad(ind_l, ((0, 0), (0, pad_y)))
        left_w2 = jnp.pad(left_w2, ((0, 0), (0, pad_y)))
    sum_i32, max_i32, disks = pl.pallas_call(
        _kernel_mxu,
        out_shape=(
            jax.ShapeDtypeStruct((ny * yb, iw), jnp.int32),
            jax.ShapeDtypeStruct((ny * yb, iw), jnp.int32),
            jax.ShapeDtypeStruct((ny * yb, nf * fb, S), jnp.uint16),
        ),
        grid=(ny, nf),
        interpret=not tpu_placement(),
        in_specs=[
            pl.BlockSpec((fb, yb, iw), lambda y, f: (f, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, yb), lambda y, f: (0, y),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yb), lambda y, f: (0, y),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((yb, iw), lambda y, f: (y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, iw), lambda y, f: (y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, fb, S), lambda y, f: (y, f, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((yb, S, iw), jnp.float32)],
    )(frames, ind_l, left_w2)
    mean = (sum_i32[:ih] // F).astype(jnp.uint16)
    mx = max_i32[:ih].astype(jnp.uint16)
    disks = jnp.transpose(disks, (2, 0, 1))[:, :ih, :F]
    return mean, mx, disks


@partial(jax.jit, static_argnames=("fb", "yb", "win"))
def _shg_fused(frames, ind_l, left_w2, fb: int, yb: int, win: int = 0):
    F, ih, iw = frames.shape
    S = ind_l.shape[0]
    nf = pl.cdiv(F, fb)
    ny = pl.cdiv(ih, yb)
    pad_f = nf * fb - F
    pad_y = ny * yb - ih
    if pad_f or pad_y:
        # zero padding is invisible: padded frames only add exact zeros to
        # the sum, cannot win the max (data is unsigned), and their disk
        # columns are sliced off below; padded rows are sliced off whole.
        # ind_l edge-pads so padded rows don't drag a tile's window min to
        # column 0 (their mask weights still multiply real data, but the
        # corresponding disk rows are sliced off).
        frames = jnp.pad(frames, ((0, pad_f), (0, pad_y), (0, 0)))
        ind_l = jnp.pad(ind_l, ((0, 0), (0, pad_y)), mode="edge")
        left_w2 = jnp.pad(left_w2, ((0, 0), (0, pad_y)))
    if win:
        kernel = partial(_kernel_win, win=win)
        scratch = [pltpu.VMEM((S, yb, win), jnp.float32),
                   pltpu.SMEM((1,), jnp.int32)]
    else:
        kernel = _kernel
        scratch = [pltpu.VMEM((S, yb, iw), jnp.float32)]
    sum_i32, max_i32, disks = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ny * yb, iw), jnp.int32),
            jax.ShapeDtypeStruct((ny * yb, iw), jnp.int32),
            jax.ShapeDtypeStruct((S, nf * fb, ny * yb), jnp.uint16),
        ),
        grid=(ny, nf),
        interpret=not tpu_placement(),  # CPU tests interpret
        in_specs=[
            pl.BlockSpec((fb, yb, iw), lambda y, f: (f, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, yb), lambda y, f: (0, y),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yb), lambda y, f: (0, y),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((yb, iw), lambda y, f: (y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, iw), lambda y, f: (y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, fb, yb), lambda y, f: (0, f, y),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )(frames, ind_l, left_w2)
    mean = (sum_i32[:ih] // F).astype(jnp.uint16)
    mx = max_i32[:ih].astype(jnp.uint16)
    disks = jnp.transpose(disks, (0, 2, 1))[:, :ih, :F]
    return mean, mx, disks


def _window_for_indices(ind_np: np.ndarray, iw: int, yb: int) -> int:
    """Smallest lane-multiple window covering every y tile's taps, or 0
    when only the full width works.

    Replicates the kernel's base arithmetic EXACTLY
    (base = align128(clip(min_idx, 0, iw - win))) per tile and verifies
    max_idx + 1 < base + win, so a pathological fit can never read taps
    outside the window — it just falls back to the full-width kernel."""
    ih = ind_np.shape[1]
    ny = -(-ih // yb)
    pad_y = ny * yb - ih
    if pad_y:
        ind_np = np.pad(ind_np, ((0, 0), (0, pad_y)), mode="edge")
    win = 128
    while win < iw:
        ok = True
        for t in range(ny):
            tile = ind_np[:, t * yb : (t + 1) * yb]
            base = (min(max(int(tile.min()), 0), iw - win) // 128) * 128
            if int(tile.max()) + 1 >= base + win:
                ok = False
                break
        if ok:
            return win
        win += 128
    return 0


def shg_fused_pallas(frames, ind_l, left_w, fb: int = 16, yb: int = 128,
                     mxu: bool | None = None, window: bool = True):
    """Fused mean/max/recon step; same contract as models.shg.shg_forward.

    frames (F, ih, iw) u16, ind_l (S, ih) i32, left_w (ih,) f32
    -> (mean u16 (ih, iw), max u16 (ih, iw), disks u16 (S, ih, F)).

    ``mxu`` selects the extraction engine: the VPU mask-reduce (False,
    O(S) per-tile work) or the batched in-kernel MXU contraction (True).
    The MXU variant measured SLOWER at every S on v5e (55.2 vs 49.0 ms
    at S=7, best-of-8 — the batch-dim transpose + full-f32 pass cost
    more than the mask-reduce they replace; docs/PERF.md "Negative
    result: in-kernel MXU mask contraction"), so None selects the VPU
    kernel; the MXU path stays available for testing and future tuning.
    """
    ih = frames.shape[1]
    if mxu is None:
        mxu = False
    # Mosaic lane rule: every block's lane dim must be divisible by 128 or
    # equal the (padded) array dim — yb is the lane dim of the index/weight
    # blocks, so it must be a multiple of 128 or cover all rows in one
    # block (u16 sublane tile is 16).
    if ih <= yb or (tpu_placement() and yb % 128):
        yb = ((ih + 15) // 16) * 16
    if mxu:
        return _shg_fused_mxu(
            jnp.asarray(frames),
            jnp.asarray(ind_l),
            jnp.asarray(left_w).astype(jnp.float32)[None, :],
            fb,
            yb,
        )
    # windowed mask contraction when the concrete shift indices allow it
    # (they always do for real spectral-line fits: a smooth cubic ± small
    # Doppler offsets spans far fewer than 128 columns per 128-row tile);
    # inside a trace the indices are abstract — use the full width
    win = 0
    if window:
        try:
            ind_np = np.asarray(ind_l)
            win = _window_for_indices(ind_np, frames.shape[2], yb)
        except Exception:
            win = 0
    return _shg_fused(
        jnp.asarray(frames),
        jnp.asarray(ind_l),
        jnp.asarray(left_w).astype(jnp.float32)[None, :],
        fb,
        yb,
        win,
    )


def shg_fused_from_fit(frames, fit_floor, fit_frac, shifts,
                       fb: int = 16, yb: int = 128):
    """Convenience wrapper taking the spectral-line fit directly."""
    iw = frames.shape[2]
    ind_l, left_w = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    return shg_fused_pallas(frames, ind_l, left_w, fb=fb, yb=yb)
