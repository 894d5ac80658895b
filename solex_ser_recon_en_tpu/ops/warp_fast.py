"""Gather-free separable warp for the pipeline's circularisation matrices.

Every correction matrix the pipeline builds has second row exactly
``[0, 1, ty]`` (geometry/ellipse.py:get_correction_matrix normalises the
2x2 correction to bottom row [0, 1]; its inverse is therefore upper
triangular, and the translation compose keeps the row).  That makes the
projective warp separable:

  - vertical: ``sy = y + ty`` — per output row a constant integer shift
    plus a constant fractional lerp weight.  Implemented as an XLA row
    gather (wide contiguous row slices — DMA speed, unlike per-element
    gathers which run ~170M idx/s on v5e).
  - horizontal: per-row bilinear resample at uniformly spaced positions
    ``sx = a*x + b*y + c``.  Implemented as a Pallas kernel: each
    (8, 128) output block pulls a narrow lane-aligned VMEM window of its
    source rows and contracts it against an iota-compare bilinear weight
    mask — no gather instruction anywhere, pure VPU compare/mul/reduce.

XLA lowers the four-tap gathers of the general path (ops/warp.py) at
~170M gathered elements/s on v5e (~50 ms per 2k x 2k warp even with the
packed-pair trick); this kernel replaces them with a few G of VPU ops.
Coordinate math (f32 meshgrid, floor, frac, projective divide) is
computed OUTSIDE the kernel with expressions identical to ops/warp.py,
so tap positions and weights round identically; only the separable
evaluation order differs from the four-term sum (~1 ulp, documented in
docs/PARITY.md).

reference: ellipse_to_circle.py:112-114 (skimage.transform.warp with the
correction matrix, bilinear, constant cval).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.placement import tpu_placement
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8      # output rows per grid cell (sublane tile)
XB = 128    # output cols per grid cell (lane tile)
_MAX_WIN = 1024  # widest supported source window per 128-col output tile


def unit_y_row(mat3: np.ndarray) -> bool:
    """True when ``mat3`` is affine with second row [0, 1, ty] — the shape
    every pipeline correction matrix has, and the precondition for the
    separable fast path."""
    m = np.asarray(mat3)
    return (
        m.shape == (3, 3)
        and m[1, 0] == 0.0
        and m[1, 1] == 1.0
        and m[2, 0] == 0.0
        and m[2, 1] == 0.0
        and m[2, 2] == 1.0
    )


def window_for(mat3: np.ndarray) -> int:
    """Static source-window width (multiple of 128) covering one output
    tile's horizontal taps, or 0 when the scale is too extreme."""
    a = abs(float(mat3[0, 0]))
    b = abs(float(mat3[0, 1]))
    # +127: the window base is rounded down to a lane multiple (Mosaic only
    # lowers lane-aligned dynamic slices), which can cost up to 127 columns
    span = a * (XB - 1) + b * (RB - 1) + 2.0 + 127.0
    win = int(-(-span // 128) * 128)
    return win if win <= _MAX_WIN else 0


def _hkernel(v_ref, loc_ref, w0_ref, w1_ref, cadd_ref, o_ref, *, win: int):
    """Contract one (RB, XB) output block against its source window.

    v_ref: (RB, Wp) f32 vertically-lerped source rows (full width).
    loc_ref: (RB, XB) i32 left-tap column index (clipped to [0, Wp-2]).
    w0/w1_ref: (RB, XB) f32 bilinear tap weights (0 where tap invalid).
    cadd_ref: (RB, XB) f32 constant cval contribution of invalid taps.
    """
    wp = v_ref.shape[1]
    x0i = loc_ref[...]
    # lane-aligned dynamic slice start (unaligned starts fail to lower)
    base = (jnp.clip(jnp.min(x0i), 0, wp - win) // 128) * 128
    v_win = v_ref[:, pl.ds(base, win)]                     # (RB, win)
    loc = x0i - base
    cw = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)  # (win, 1)
    w0 = w0_ref[...]
    w1 = w1_ref[...]
    for r in range(RB):
        lr = loc[r][None, :]                               # (1, XB)
        # bilinear weights as a one-hot-pair mask; invalid taps weight 0
        wt = (cw == lr).astype(jnp.float32) * w0[r][None, :] + (
            cw == lr + 1
        ).astype(jnp.float32) * w1[r][None, :]             # (win, XB)
        o_ref[r, :] = jnp.sum(v_win[r][:, None] * wt, axis=0) + cadd_ref[r, :]


@partial(jax.jit, static_argnames=("win",))
def _hresample(V, loc, w0, w1, cadd, win: int):
    """Pallas horizontal pass: V (Hp, Wp) f32 -> (Hp, OWp) f32."""
    hp, wp = V.shape
    owp = loc.shape[1]
    ni = hp // RB
    nj = owp // XB
    blk = lambda i, j: (i, j)
    return pl.pallas_call(
        partial(_hkernel, win=win),
        grid=(ni, nj),
        interpret=not tpu_placement(),
        in_specs=[
            pl.BlockSpec((RB, wp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, XB), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, XB), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, XB), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, XB), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, XB), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, owp), jnp.float32),
    )(V, loc, w0, w1, cadd)


@partial(jax.jit, static_argnames=("out_h", "out_w", "win"))
def _warp_unit_y(image_f01, mat3, out_h: int, out_w: int, win: int,
                 cval: jax.Array | float = 0.0):
    """Separable warp of a float [0,1) image by a unit-y-row matrix."""
    h, w_in = image_f01.shape
    m = mat3.astype(jnp.float32)
    cval_f = jnp.float32(cval)

    # coordinate math replicated from ops/warp.py (identical expressions,
    # so floors and fractional weights round identically)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
    sy_col = m[1, 0] * xs[:1] + m[1, 1] * ys + m[1, 2]  # x-independent
    w = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]           # == 1.0 everywhere
    sx = sx / w
    x0 = jnp.floor(sx)
    dx = sx - x0
    x0i = x0.astype(jnp.int32)
    y0 = jnp.floor(sy_col)
    dy = (sy_col - y0)[:, None]
    y0i = y0.astype(jnp.int32)

    # vertical pass: wide row gathers lower to contiguous per-row DMA
    ok0 = ((y0i >= 0) & (y0i < h))[:, None]
    ok1 = ((y0i + 1 >= 0) & (y0i + 1 < h))[:, None]
    r0 = jnp.take(image_f01, jnp.clip(y0i, 0, h - 1), axis=0)
    r1 = jnp.take(image_f01, jnp.clip(y0i + 1, 0, h - 1), axis=0)
    V = (
        jnp.where(ok0, r0, cval_f) * (1.0 - dy)
        + jnp.where(ok1, r1, cval_f) * dy
    )  # (out_h, w_in)

    # horizontal tap weights; invalid taps contribute cval instead
    val0 = ((x0i >= 0) & (x0i < w_in)).astype(jnp.float32)
    val1 = ((x0i + 1 >= 0) & (x0i + 1 < w_in)).astype(jnp.float32)
    w0 = (1.0 - dx) * val0
    w1 = dx * val1
    cadd = cval_f * ((1.0 - dx) * (1.0 - val0) + dx * (1.0 - val1))

    # pad for the kernel: rows to RB, source cols to >= win, out cols to XB
    hp = -(-out_h // RB) * RB
    wp = max(-(-w_in // XB) * XB, win)
    owp = -(-out_w // XB) * XB
    V = jnp.pad(V, ((0, hp - out_h), (0, wp - w_in)))
    pad2 = ((0, hp - out_h), (0, owp - out_w))
    # x0i stays UNCLIPPED: out-of-image taps carry zero weight, and their
    # window-relative index simply never matches the iota (a clip would
    # remap x0i=-1's valid right tap from column 0 to 1).  Edge-pad: zero
    # padding would drag a block's window min to 0 and push the real taps
    # outside the window.
    loc = jnp.pad(x0i, pad2, mode="edge")
    out = _hresample(
        V, loc, jnp.pad(w0, pad2), jnp.pad(w1, pad2), jnp.pad(cadd, pad2),
        win,
    )
    return out[:out_h, :out_w]


def warp_unit_y_u16(image_u16, mat3_np: np.ndarray, out_h: int, out_w: int,
                    cval: float = 0.0):
    """Fast-path warp for uint16 sources and unit-y-row matrices.

    Same contract as ops/warp.py:warp_projective_u16 (u16/65536 scaling,
    per-neighbour cval); output differs from the four-term evaluation
    only in the separable sum order (<= ~2e-7).  Caller must check
    ``unit_y_row`` and ``window_for`` first.
    """
    win = window_for(mat3_np)
    if not win:
        raise ValueError("horizontal scale too extreme for the fast warp")
    img = jnp.asarray(image_u16).astype(jnp.float32) * jnp.float32(1 / 65536)
    return _warp_unit_y(img, jnp.asarray(mat3_np), out_h, out_w, win, cval)


def warp_unit_y_f01(image_f01, mat3_np: np.ndarray, out_h: int, out_w: int,
                    cval: float = 0.0):
    """Fast-path warp for float [0, 1) sources (ops/warp.py:warp_projective
    contract).  Caller must check ``unit_y_row`` and ``window_for``."""
    win = window_for(mat3_np)
    if not win:
        raise ValueError("horizontal scale too extreme for the fast warp")
    img = jnp.asarray(image_f01).astype(jnp.float32)
    return _warp_unit_y(img, jnp.asarray(mat3_np), out_h, out_w, win, cval)


def warp_unit_y_u16_batched(images_u16, mat3_np: np.ndarray, out_h: int,
                            out_w: int, cval: float | None = 0.0):
    """vmapped fast warp over a leading batch axis (Doppler sweeps).

    ``cval=None`` uses each image's own [0, 0] pixel (scaled), matching
    the per-image cval of the sequential reference loop
    (ellipse_to_circle.py:113-114 via Solex_recon.py:120-123)."""
    win = window_for(mat3_np)
    if not win:
        raise ValueError("horizontal scale too extreme for the fast warp")
    imgs = jnp.asarray(images_u16).astype(jnp.float32) * jnp.float32(1 / 65536)
    m = jnp.asarray(mat3_np)
    if cval is None:
        fn = lambda im: _warp_unit_y(im, m, out_h, out_w, win, im[0, 0])
    else:
        fn = lambda im: _warp_unit_y(im, m, out_h, out_w, win, cval)
    return jax.vmap(fn)(imgs)
