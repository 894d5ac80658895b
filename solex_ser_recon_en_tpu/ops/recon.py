"""Multi-shift disk reconstruction — the pipeline's hot kernel.

reference: solex_util.py:93-144 (``read_video_improved``) — a Python loop
over frames and shifts doing per-row fancy indexing:

    out[s][y, f] = img_f[y, l(s,y)] * (1-frac(y)) + img_f[y, l(s,y)+1] * frac(y)
    l(s,y) = clip(floor(curve(y)) + shift_s, 0, iw-2)      (:113-119)

TPU design: the entire scan is one batched device op over an in-HBM frame
slab — no Python frame loop.  Two interchangeable kernels:

- ``gather``: one ``take_along_axis`` per (left,right) neighbour, vectorised
  over frames and shifts.  Minimal FLOPs; XLA lowers to a dynamic-gather.
- ``onehot``: expresses the gather-and-lerp as a per-row matmul with a sparse
  (two non-zeros per row) weight matrix W[s,y,x], i.e. a dot_general batched
  over the spatial row axis:  out[y,s,f] = sum_x W[y,s,x] * frames[y,f,x].
  This maps the whole reconstruction onto the MXU and avoids gather
  entirely; it is the fastest path on TPU for realistic shapes.

Both read the frame slab exactly once (HBM-bandwidth bound, the roofline for
this op).  Output matches the reference's float64 loop within 1 LSB (we
accumulate in float32).

The frame axis is embarrassingly parallel (each frame writes a disjoint
output column — SURVEY.md §5.7), so both kernels work unchanged under a
frame-sharded ``jax.sharding.Mesh`` with zero cross-device communication.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.placement import tpu_placement


def build_shift_indices(
    fit_floor: np.ndarray, fit_frac: np.ndarray, shifts, iw: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shift left-neighbour columns and left weights.

    reference: solex_util.py:113-123 — indices clipped to [0, iw-2]; the
    left weight is 1-frac and does NOT depend on the shift.

    Returns (ind_l (S, ih) int32, left_w (ih,) float32).
    """
    shifts = np.asarray(shifts, dtype=np.int64)
    ind_l = fit_floor.astype(np.int64)[None, :] + shifts[:, None]
    ind_l = np.clip(ind_l, 0, iw - 2).astype(np.int32)
    left_w = (1.0 - np.asarray(fit_frac)).astype(np.float32)
    return ind_l, left_w


@partial(jax.jit, static_argnames=("out_u16",))
def _recon_gather(frames, ind_l, left_w, out_u16: bool = True):
    """out[s, y, f] via take_along_axis. frames (F, ih, iw) uint16."""
    f32 = frames.astype(jnp.float32)
    # indices (S, 1, ih, 1) gathered along the wavelength axis
    idx = ind_l[:, None, :, None].astype(jnp.int32)
    left = jnp.take_along_axis(f32[None], idx, axis=3)[..., 0]       # (S,F,ih)
    right = jnp.take_along_axis(f32[None], idx + 1, axis=3)[..., 0]  # (S,F,ih)
    w = left_w[None, None, :]
    out = left * w + right * (1.0 - w)
    out = jnp.transpose(out, (0, 2, 1))  # (S, ih, F)
    if out_u16:
        out = jnp.clip(out, 0, 65535).astype(jnp.uint16)
    return out


@partial(jax.jit, static_argnames=("iw", "out_u16"))
def _recon_onehot(frames, ind_l, left_w, iw: int, out_u16: bool = True):
    """out[s, y, f] as a row-batched matmul on the MXU.

    W[y, s, x] = left_w[y]·1[x=ind_l[s,y]] + (1-left_w[y])·1[x=ind_l[s,y]+1]
    out[y, s, f] = Σ_x W[y, s, x] · frames[f, y, x]
    """
    S, ih = ind_l.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (ih, S, iw), 2)
    l = jnp.transpose(ind_l, (1, 0))[:, :, None]          # (ih, S, 1)
    w = left_w[:, None, None]                             # (ih, 1, 1)
    W = jnp.where(cols == l, w, 0.0) + jnp.where(cols == l + 1, 1.0 - w, 0.0)
    # batched over y: (ih, S, iw) @ (ih, F, iw)^T -> (ih, S, F)
    # HIGHEST: full-f32 MXU passes — the default (one bf16 pass) loses ~2^-9
    # relative accuracy, i.e. up to ~128 of 65535 levels.  The op is
    # HBM-bound, so the extra passes are free.
    out = jax.lax.dot_general(
        W,
        frames.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (1,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.transpose(out, (1, 0, 2))  # (S, ih, F)
    if out_u16:
        out = jnp.clip(out, 0, 65535).astype(jnp.uint16)
    return out


def reconstruct(
    frames,
    fit_floor: np.ndarray,
    fit_frac: np.ndarray,
    shifts,
    kernel: str = "auto",
    out_u16: bool = True,
) -> jax.Array:
    """Reconstruct disks for every shift: (S, ih, F).

    frames: (F, ih, iw) uint16 (np or device array).
    fit_floor/fit_frac: (ih,) spectral-line fit (floor + fractional part).
    """
    iw = frames.shape[2]
    ind_l, left_w = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    ind_l = jnp.asarray(ind_l)
    left_w = jnp.asarray(left_w)
    frames = jnp.asarray(frames)
    if kernel == "auto":
        # onehot is the fastest recon-only kernel on TPU (HBM-bound,
        # S-independent).  When mean/max are needed too, the fused
        # single-pass Pallas step (ops/fused_pallas.py, selected by
        # models.shg.shg_forward) beats running this after a separate
        # reduction for S <= 4.
        kernel = "onehot" if tpu_placement() else "gather"
    if kernel == "gather":
        return _recon_gather(frames, ind_l, left_w, out_u16=out_u16)
    if kernel == "onehot":
        return _recon_onehot(frames, ind_l, left_w, iw=iw, out_u16=out_u16)
    if kernel == "pallas":
        from .pallas_recon import _recon_pallas

        ih = frames.shape[1]
        yb = min(256, ((ih + 7) // 8) * 8)
        return _recon_pallas(
            frames, ind_l, left_w.astype(jnp.float32)[None, :], 8, yb
        )
    raise ValueError(f"unknown recon kernel {kernel!r}")


class StreamingRecon:
    """Chunked reconstruction for scans streamed through HBM.

    Each chunk of frames fills a disjoint column slab of the output
    (reference frame loop solex_util.py:127-134 writes column FrameIndex);
    chunks can therefore be processed independently and even on different
    devices.
    """

    def __init__(self, shifts, fit_floor, fit_frac, kernel="auto",
                 progress=None):
        self.shifts = list(shifts)
        self.fit_floor = fit_floor
        self.fit_frac = fit_frac
        self.kernel = kernel
        self.progress = progress  # live-view hook: progress(part, start, frame)
        self._parts = []  # (start, device array) — downloaded once at result()

    def update(self, start: int, chunk) -> None:
        part = reconstruct(
            chunk, self.fit_floor, self.fit_frac, self.shifts, kernel=self.kernel
        )
        self._parts.append((start, part))
        if self.progress is not None:
            # chunk is already normalized (F, ih, iw); last frame = the
            # slit image the reference flashes (solex_util.py:137)
            self.progress(part, start, chunk[-1])

    def result(self) -> np.ndarray:
        self._parts.sort(key=lambda p: p[0])
        whole = jnp.concatenate([p for _, p in self._parts], axis=2)
        return np.asarray(whole)
