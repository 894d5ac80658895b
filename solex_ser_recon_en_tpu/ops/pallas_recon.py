"""Pallas TPU kernel for the multi-shift reconstruction.

An alternative to the XLA one-hot matmul (ops/recon.py): per frame tile in
VMEM, each shift's (left, right) spectral columns are extracted with an
iota-compare mask and a lane reduction on the VPU, then lerped — no S*iw
one-hot weight tensor and no MXU passes, so the kernel is a pure single
HBM read of the slab.

Layout per grid step (frames tiled by FB):
    frames_ref (FB, ih, iw) u16  ->  out_ref (S, ih, FB) u16

The shift indices only depend on the row, so the compare masks are built
once per step from the (S, ih) index array resident in VMEM.
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


def _kernel(frames_ref, ind_ref, w_ref, out_ref):
    fb, ih, iw = frames_ref.shape
    S = ind_ref.shape[0]
    # Mosaic lacks a direct u16<->f32 cast; hop through int32
    frames = frames_ref[:].astype(jnp.int32).astype(jnp.float32)  # (FB, ih, iw)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ih, iw), 1)
    w = w_ref[0, :]                                     # (yb,)
    for s in range(S):
        idx = ind_ref[s, :][:, None]                    # (ih, 1)
        lmask = (cols == idx).astype(jnp.float32)       # (ih, iw)
        rmask = (cols == idx + 1).astype(jnp.float32)
        left = jnp.sum(frames * lmask[None, :, :], axis=2)   # (FB, ih)
        right = jnp.sum(frames * rmask[None, :, :], axis=2)
        val = left * w[None, :] + right * (1.0 - w[None, :])
        # output tile layout (S, FB, ih): lane dim = ih (128-aligned)
        out_ref[s, :, :] = (
            jnp.clip(val, 0, 65535).astype(jnp.int32).astype(jnp.uint16)
        )


@partial(jax.jit, static_argnames=("fb", "yb"))
def _recon_pallas(frames, ind_l, left_w, fb: int, yb: int):
    F, ih, iw = frames.shape
    S = ind_l.shape[0]
    nf = pl.cdiv(F, fb)
    ny = pl.cdiv(ih, yb)
    pad_f = nf * fb - F
    pad_y = ny * yb - ih
    if pad_f or pad_y:
        frames = jnp.pad(frames, ((0, pad_f), (0, pad_y), (0, 0)))
        ind_l = jnp.pad(ind_l, ((0, 0), (0, pad_y)))
        left_w = jnp.pad(left_w, ((0, 0), (0, pad_y)))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((S, nf * fb, ny * yb), jnp.uint16),
        grid=(nf, ny),
        interpret=not tpu_placement(),  # CPU tests run interpreted
        in_specs=[
            pl.BlockSpec((fb, yb, iw), lambda f, y: (f, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, yb), lambda f, y: (0, y), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yb), lambda f, y: (0, y), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, fb, yb), lambda f, y: (0, f, y),
                               memory_space=pltpu.VMEM),
    )(frames, ind_l, left_w)
    out = jnp.transpose(out, (0, 2, 1))  # (S, ih, F_padded) — tiny
    return out[:, :ih, :F]


def recon_pallas(frames, fit_floor, fit_frac, shifts, fb: int = 8, yb: int = 256):
    """Multi-shift recon via the Pallas kernel; same contract as
    ops.recon.reconstruct."""
    iw = frames.shape[2]
    ih = frames.shape[1]
    yb = min(yb, ((ih + 7) // 8) * 8)
    ind_l, left_w = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    return _recon_pallas(
        jnp.asarray(frames),
        jnp.asarray(ind_l),
        jnp.asarray(left_w.astype(np.float32))[None, :],
        fb,
        yb,
    )
