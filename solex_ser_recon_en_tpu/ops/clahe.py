"""CLAHE (contrast-limited adaptive histogram equalisation) on device.

reference: the reference calls ``cv2.createCLAHE(clipLimit=0.8,
tileGridSize=(2,2)).apply(frame)`` on the final uint16 disk
(solex_util.py:532-533) and with tile sizes 1-4 in the standalone tool
(clahe_apply.py:247).  This module reimplements OpenCV's exact algorithm
(modules/imgproc clahe semantics) as XLA ops so the product stage stays on
device:

1. pad right/bottom with BORDER_REFLECT_101 to a multiple of the tile grid,
2. per-tile histogram (65536 bins for uint16),
3. clip at max(1, int(clipLimit*tileArea/histSize)) and redistribute the
   excess (uniform batch + residual at stride max(histSize/residual, 1)),
4. LUT = round_half_even(cdf * (histSize-1)/tileArea),
5. bilinear interpolation of the 4 neighbouring tile LUTs over the
   *original* (unpadded) pixel grid.

Matches cv2 bit-for-bit on uint8/uint16 inputs (see tests/test_clahe.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.placement import tpu_placement
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_histograms_sort(tiles: jax.Array, hist_size: int) -> jax.Array:
    """tiles (T, n) int32 values -> (T, hist_size) int32 counts.

    Sort + searchsorted instead of scatter-add: TPU has no fast scatter,
    but sorts and vectorised binary searches map onto the VPU.
    cumcount[v] = #vals <= v, hist = diff(cumcount).
    """

    def one(vals):
        s = jnp.sort(vals)
        edges = jnp.arange(hist_size, dtype=jnp.int32)
        cum = jnp.searchsorted(s, edges, side="right")
        return jnp.diff(cum, prepend=0).astype(jnp.int32)

    return jax.vmap(one)(tiles)


_HIST_CHUNK = 4096


def _make_hist_kernel(nc: int):
    def _hist_kernel(tiles_ref, out_ref):
        """One chunk of values -> accumulate the (256, 256) 2-level histogram.

        hist[hi, lo] = #values with value>>8 == hi and value&255 == lo: the
        outer product of the two byte one-hots, i.e. ONE MXU contraction
        A^T B with A = onehot(hi), B = onehot(lo) — no scatter, no sort.
        bf16 operands are exact for 0/1 and f32 accumulation is exact below
        2^24 counts.  Padding slots hold -1: -1>>8 == -1 matches no bin.
        """
        i = pl.program_id(0)
        vals = tiles_ref[0]                     # (8, CH/8)
        L = vals.shape[1]
        bins = jax.lax.broadcasted_iota(jnp.int32, (L, 256), 1)
        acc = jnp.zeros((256, 256), jnp.float32)
        for r in range(vals.shape[0]):          # Mosaic: 1 contracting dim
            row = vals[r, :][:, None]           # (L, 1)
            A = (jnp.right_shift(row, 8) == bins).astype(jnp.bfloat16)
            B = (jnp.bitwise_and(row, 255) == bins).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                A, B,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # (256, 256)

        @pl.when(i % nc == 0)
        def _():
            out_ref[0] = acc

        @pl.when(i % nc != 0)
        def _():
            out_ref[0] = out_ref[0] + acc

    return _hist_kernel


def _tile_histograms_mxu(tiles: jax.Array, hist_size: int) -> jax.Array:
    """Exact u16 histograms via the two-level one-hot MXU matmul (Pallas).

    Replaces the per-tile sort on v5e for CLAHE-sized tiles; counts are
    exact while tile_area < 2^24 (f32 integer range) — callers gate on
    that.  hist_size 256 works through the same kernel (hi byte is always
    0, row 0 of the 2-level table holds the whole histogram).
    """
    T, n = tiles.shape
    ch = _HIST_CHUNK
    nc = pl.cdiv(n, ch)
    if nc * ch != n:
        tiles = jnp.pad(tiles, ((0, 0), (0, nc * ch - n)), constant_values=-1)
    # (T*nc, 8, ch/8): sublane/lane dims satisfy the Mosaic (8, 128k) tile
    # rule; grid walks chunks consecutively within each tile so the output
    # block (index t = i // nc) accumulates in VMEM
    chunks = tiles.reshape(T * nc, 8, ch // 8)
    out = pl.pallas_call(
        _make_hist_kernel(nc),
        out_shape=jax.ShapeDtypeStruct((T, 256, 256), jnp.float32),
        grid=(T * nc,),
        interpret=not tpu_placement(),
        in_specs=[
            pl.BlockSpec((1, 8, ch // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 256, 256), lambda i: (i // nc, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(chunks)
    flat = out.reshape(T, 65536).astype(jnp.int32)
    return flat[:, :hist_size]


def _tile_histograms(tiles: jax.Array, hist_size: int) -> jax.Array:
    if (
        tpu_placement()
        and hist_size in (256, 65536)
        and tiles.shape[1] < (1 << 24)
    ):
        return _tile_histograms_mxu(tiles, hist_size)
    return _tile_histograms_sort(tiles, hist_size)


def _clip_redistribute(hist: jax.Array, clip: jax.Array, hist_size: int) -> jax.Array:
    """OpenCV's histogram clipping + excess redistribution (per tile)."""
    clipped = jnp.sum(jnp.maximum(hist - clip, 0), axis=-1, keepdims=True)
    h = jnp.minimum(hist, clip)
    redist = clipped // hist_size
    residual = clipped - redist * hist_size  # (T, 1)
    h = h + redist
    idx = jnp.arange(hist_size, dtype=jnp.int32)[None, :]
    step = jnp.maximum(hist_size // jnp.maximum(residual, 1), 1)
    bonus = ((idx % step) == 0) & ((idx // step) < residual)
    return h + bonus.astype(jnp.int32)


def percentile_from_hist(hist: jax.Array, n: int, q_pct: float) -> jax.Array:
    """jnp.percentile(values.astype(f32), q_pct), computed from the exact
    value histogram instead of a sort.

    Valid because the values are integer bin indices (u8/u16 images cast
    to f32 exactly): the k-th order statistic is the smallest bin whose
    cumulative count reaches k+1.  The q->index arithmetic mirrors
    jax._src.numpy.reductions._quantile (method='linear') step for step
    in float32; the order statistics are exact, and the final
    lerp agrees with jnp.percentile to a few ULP (this path's fused
    mul+add is often exactly rounded while jnp's separate f32 products
    each round — tests/test_clahe.py asserts ≤8 ULP agreement; the
    product stage's stretch scales are insensitive at that magnitude).
    """
    if n >= (1 << 31):  # int32 cumsum would wrap (and x64 is disabled,
        # so an int64 "upgrade" would silently truncate — refuse instead)
        raise ValueError(f"percentile_from_hist: n={n} exceeds int32 counts")
    # mirror jnp.percentile exactly: true_divide on the raw python float
    # keeps numpy's weak-type folding (f32(33.3)/f32(100) differs from it
    # in the last bits)
    q = jnp.true_divide(q_pct, 100)
    nf = jnp.float32(n)
    qn = q * (nf - 1)
    low = jnp.clip(jnp.floor(qn), 0, nf - 1)
    high = jnp.clip(jnp.ceil(qn), 0, nf - 1)
    high_w = qn - jnp.floor(qn)
    low_w = 1.0 - high_w
    cum = jnp.cumsum(hist.astype(jnp.int32))
    k = jnp.stack([low, high]).astype(cum.dtype) + 1
    s = jnp.searchsorted(cum, k, side="left").astype(jnp.float32)
    return s[0] * low_w + s[1] * high_w


def value_histogram(img: jax.Array, hist_size: int) -> jax.Array:
    """Exact (hist_size,) histogram of a full u8/u16 image (one tile)."""
    flat = img.astype(jnp.int32).reshape(1, -1)
    return _tile_histograms(flat, hist_size)[0]


@partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "hist_size", "clip_limit",
                     "return_full_hist"),
)
def _clahe(img: jax.Array, clip_limit: float, tiles_x: int, tiles_y: int,
           hist_size: int, return_full_hist: bool = False):
    h, w = img.shape
    pad_r = (-w) % tiles_x
    pad_b = (-h) % tiles_y
    src = jnp.pad(img, ((0, pad_b), (0, pad_r)), mode="reflect")
    ph, pw = h + pad_b, w + pad_r
    th, tw = ph // tiles_y, pw // tiles_x
    tile_area = th * tw
    lut_scale = jnp.float32(hist_size - 1) / jnp.float32(tile_area)
    clip = max(int(clip_limit * tile_area / hist_size), 1) if clip_limit > 0 else 0

    vals = src.astype(jnp.int32)
    tiles = (
        vals.reshape(tiles_y, th, tiles_x, tw)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tiles_x, tile_area)
    )
    hist = _tile_histograms(tiles, hist_size)
    # unpadded grids: the exact full-image histogram is the tile sum, free
    # for callers that also need image percentiles (pipeline/products.py);
    # reflect padding would double-count edge pixels, so None then
    full_hist = (
        jnp.sum(hist, axis=0) if (pad_r == 0 and pad_b == 0) else None
    ) if return_full_hist else None
    if clip > 0:
        hist = _clip_redistribute(hist, jnp.int32(clip), hist_size)
    cdf = jnp.cumsum(hist, axis=-1)
    luts = jnp.clip(
        jnp.round(cdf.astype(jnp.float32) * lut_scale), 0, hist_size - 1
    ).astype(jnp.int32)  # (T, hist_size)

    # bilinear interpolation of tile LUTs over the ORIGINAL grid
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    txf = x / tw - 0.5
    tyf = y / th - 0.5
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    xa = txf - tx1
    ya = tyf - ty1
    tx2 = jnp.minimum(tx1 + 1, tiles_x - 1)
    tx1 = jnp.maximum(tx1, 0)
    ty2 = jnp.minimum(ty1 + 1, tiles_y - 1)
    ty1 = jnp.maximum(ty1, 0)

    v = img.astype(jnp.int32)

    T = tiles_y * tiles_x
    if T <= 8:
        # ONE per-pixel gather fetches every tile's LUT value for v (a
        # (hist_size, T) packed row), then the four bilinear taps become
        # cheap per-pixel selects — gathers are the expensive op on TPU,
        # selects are VPU noise.  Values and weight arithmetic are
        # unchanged (bit-exact).  Only viable for small grids: the packed
        # gather materialises (h, w, T) and the select sweep unrolls T
        # times, so large tile counts (standalone CLAHE tool allows up to
        # tiles=(16,16)) would blow memory/trace size — those take the
        # flat-gather path below (4 gathers regardless of T).
        G = luts.T[v]                            # (h, w, T)

        def tile_lookup(ty, tx):
            slot = ty[:, None] * tiles_x + tx[None, :]    # (h, w)
            out = jnp.zeros(v.shape, jnp.int32)
            for t in range(T):
                out = jnp.where(slot == t, G[..., t], out)
            return out.astype(jnp.float32)
    else:
        luts_flat = luts.reshape(-1)             # (T * hist_size,)

        def tile_lookup(ty, tx):
            slot = ty[:, None] * tiles_x + tx[None, :]    # (h, w)
            return luts_flat[slot * hist_size + v].astype(jnp.float32)

    wx1 = (1.0 - xa)[None, :]
    wy1 = (1.0 - ya)[:, None]
    res = (
        tile_lookup(ty1, tx1) * wx1 * wy1
        + tile_lookup(ty1, tx2) * (1 - wx1) * wy1
        + tile_lookup(ty2, tx1) * wx1 * (1 - wy1)
        + tile_lookup(ty2, tx2) * (1 - wx1) * (1 - wy1)
    )
    out = jnp.clip(jnp.round(res), 0, hist_size - 1)
    if return_full_hist:
        return out, full_hist
    return out


def clahe(img, clip_limit: float = 0.8, tiles=(2, 2)) -> jax.Array:
    """cv2-compatible CLAHE. img: (H, W) uint8 or uint16."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        hist_size = 256
        out_dtype = jnp.uint8
    elif img.dtype == jnp.uint16:
        hist_size = 65536
        out_dtype = jnp.uint16
    else:
        raise TypeError(f"clahe expects uint8/uint16, got {img.dtype}")
    out = _clahe(img, float(clip_limit), int(tiles[0]), int(tiles[1]), hist_size)
    return out.astype(out_dtype)
