"""Raw-layout fused scan processing — the minimum-HBM-traffic device path.

The scan is inherently two passes (the recon needs the line fit, which needs
the mean image — reference: Solex_recon.py:61-63), so the roofline is two
HBM reads of the frame slab.  The naive path adds a full materialised
normalisation (rot90 transpose + 8->16 upscale) on top; this module removes
it by operating directly on the *raw on-disk layout*:

- pass A: int32 sum + max reductions over raw frames; the tiny (H, W)
  results are rotated/upscaled once at the end.
- pass B: the one-hot recon matmul contracts over the raw spectral axis
  with the weight tensor pre-flipped to absorb the rot90, so the 2.4 GB
  slab is never transposed — only the (S, ih, F) output is.

For wide-stored scans (Width > Height, the common Sol'Ex case):
    norm[y, x] = raw[x, W-1-y]   (np.rot90; video_reader.py:119-120)
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .recon import build_shift_indices


@jax.jit
def _fold_raw(sum_acc, max_acc, raw_chunk):
    s = sum_acc + jnp.sum(raw_chunk.astype(jnp.int32), axis=0)
    m = jnp.maximum(max_acc, jnp.max(raw_chunk, axis=0))
    return s, m


@partial(jax.jit, static_argnames=("rotate", "upscale"))
def _recon_raw_lerp(raw, ind_l, left_w, rotate: bool, upscale: bool):
    """Elementwise two-tap gather-lerp recon — the CPU-backend body.

    Mathematically identical to the one-hot contraction (_recon_raw): the
    matmul's other terms are exact ±0.0 products.  The difference is
    codegen stability: XLA:CPU picks the dot's FMA chaining BY SHAPE, so
    per-device one-hot results can shift 1 f32 ULP when the frame batch
    changes (feed chunking, mesh sharding) — observed as 1-LSB disk
    differences.  Gather + elementwise lerp compiles to the same
    vectorised loop at every shape, which is what lets the mesh product
    pipeline assert BIT-identity vs single-device on the virtual CPU
    mesh.  TPU keeps the one-hot MXU contraction (systolic accumulation
    of exact zeros is shape-stable, and it is the fast path there)."""
    f = raw.astype(jnp.float32)
    if upscale:
        f = f * 256.0
    if rotate:
        # norm[f, y, x] = raw[f, x, W-1-y]
        f = jnp.flip(jnp.swapaxes(f, 1, 2), axis=1)
    f4 = f[:, None, :, :]                          # (F, 1, ih, iw)
    g0 = jnp.take_along_axis(f4, ind_l[None, :, :, None], axis=3)
    g1 = jnp.take_along_axis(f4, (ind_l + 1)[None, :, :, None], axis=3)
    w = left_w[None, None, :, None]
    out = (w * g0 + (1.0 - w) * g1)[..., 0]        # (F, S, ih)
    out = jnp.transpose(out, (1, 2, 0))            # (S, ih, F)
    return jnp.clip(out, 0, 65535).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("rotate", "upscale"))
def _recon_raw(raw, Wt, rotate: bool, upscale: bool):
    """raw (F, H, W) u16/u8, Wt (spatial, S, iw) f32 already in raw spatial
    order -> disks (S, ih, F) u16 in normalised orientation."""
    f = raw.astype(jnp.float32)
    if upscale:
        f = f * 256.0
    if rotate:
        # norm[y, x] = raw[x, W-1-y]: batch over raw axis 2 (reversed
        # spatial), contract over raw axis 1 (spectral)
        out = jax.lax.dot_general(
            Wt,
            f,
            dimension_numbers=(((2,), (1,)), ((0,), (2,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (spatial_rev, S, F)
        out = jnp.flip(out, axis=0)          # -> spatial (ih) ascending
        out = jnp.transpose(out, (1, 0, 2))  # (S, ih, F)
    else:
        out = jax.lax.dot_general(
            Wt,
            f,
            dimension_numbers=(((2,), (2,)), ((0,), (1,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (ih, S, F)
        out = jnp.transpose(out, (1, 0, 2))
    return jnp.clip(out, 0, 65535).astype(jnp.uint16)


def build_raw_weights(
    fit_floor: np.ndarray, fit_frac: np.ndarray, shifts: List[int], iw: int,
    rotate: bool, upscale: bool,
) -> jnp.ndarray:
    """One-hot interp weights (spatial_raw, S, iw) f32 for _recon_raw.

    The spatial axis is emitted in raw storage order (reversed when the scan
    is stored wide) so the recon contracts the raw slab without transposing
    it; the 8-bit x256 upscale stays on the data side (_recon_raw).
    """
    ind_l, left_w = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    S, ih = ind_l.shape
    cols = np.arange(iw, dtype=np.int32)[None, None, :]
    l = ind_l.T[:, :, None]                     # (ih, S, 1)
    w = left_w[:, None, None]
    W = np.where(cols == l, w, 0.0) + np.where(cols == l + 1, 1.0 - w, 0.0)
    W = W.astype(np.float32)                    # (ih, S, iw)
    if rotate:
        W = W[::-1]                             # raw spatial order (W-1-y)
    return jnp.asarray(np.ascontiguousarray(W))


class RawScanProcessor:
    """Two-pass scan processing over raw device chunks.

    Usage: feed every chunk to ``accumulate`` (pass A, chunks stay resident
    if ``keep``), call ``mean_max`` for the normalised mean/max, then
    ``reconstruct(fit, shifts)`` (pass B over the resident chunks).
    """

    def __init__(self, height: int, width: int, rotate: bool, upscale: bool,
                 frame_count: int | None = None, mesh=None):
        self.rotate = rotate
        self.upscale = upscale
        self.ih = max(width, height) if rotate else height
        self.iw = min(width, height) if rotate else width
        self._sum = jnp.zeros((height, width), jnp.int32)
        self._max = jnp.zeros((height, width), jnp.uint16)
        if mesh is not None:
            # accumulators replicated over the mesh: folding a frame-sharded
            # chunk then reduces with one psum over 'frame' (ICI)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._sum = jax.device_put(self._sum, rep)
            self._max = jax.device_put(self._max, rep)
        self._chunks: List[Tuple[int, jax.Array]] = []
        # when given, the true scan length: feeders zero-pad the trailing
        # chunk to a bucket shape (io/feeder.py) — zeros are neutral for
        # sum/max, and the recon output is sliced back to this length
        self.frame_count = frame_count
        self.count = 0

    def accumulate(self, start: int, raw_chunk: jax.Array, keep: bool = True) -> None:
        self._sum, self._max = _fold_raw(self._sum, self._max, raw_chunk)
        self.count += raw_chunk.shape[0]
        if self.frame_count is not None:
            self.count = min(self.count, self.frame_count)
        if keep:
            self._chunks.append((start, raw_chunk))

    def mean_max(self) -> Tuple[np.ndarray, np.ndarray]:
        """Normalised-orientation mean (uint16, reference truncation) and max."""
        total = np.asarray(self._sum, dtype=np.int64)
        mx = np.asarray(self._max)
        if self.rotate:
            total = np.rot90(total)
            mx = np.rot90(mx)
        scale = 256 if self.upscale else 1
        mean = ((total.astype(np.float64) * scale) / self.count).astype(np.uint16)
        if self.upscale:
            mx = (mx.astype(np.uint16)) << 8
        return mean, np.ascontiguousarray(mx)

    # resident scans up to this many bytes are merged to ONE canonical
    # (frame_count, H, W) slab before pass B (see reconstruct); larger
    # scans keep the per-chunk streaming recon (transient 2x memory of a
    # multi-GB slab isn't worth shape canonicalisation there, and no
    # equality contract compares big-scan chunkings)
    _MERGE_CAP_BYTES = 1024**3

    def reconstruct(self, fit_floor, fit_frac, shifts: List[int],
                    progress=None) -> jax.Array:
        if not self._chunks:
            raise ValueError("no resident chunks to reconstruct from")
        self._chunks.sort(key=lambda p: p[0])
        chunks = self._chunks
        total = sum(int(c.nbytes) for _, c in chunks)
        n = sum(int(c.shape[0]) for _, c in chunks)
        if (
            self.frame_count is not None
            and total <= self._MERGE_CAP_BYTES
            and (len(chunks) > 1 or n != self.frame_count)
        ):
            # canonicalise the recon input to ONE (frame_count, H, W) slab
            # (an HBM-local copy): the feed's chunking (watchdog-sized
            # chunks, bucket padding, mesh shard fitting) must not leak
            # into pass-B arithmetic — XLA picks its contraction FMA
            # chaining by shape, so per-chunk recon is bit-stable only if
            # the chunk layout is; merged, disks are bit-identical across
            # every feed chunking and mesh layout (test_mesh_pipeline).
            slab = (
                jnp.concatenate([c for _, c in chunks], axis=0)
                if len(chunks) > 1 else chunks[0][1]
            )
            chunks = [(0, slab[: self.frame_count])]
            self._chunks = chunks  # drop per-chunk refs -> frees the copies
        return self.reconstruct_streaming(
            chunks, fit_floor, fit_frac, shifts, progress=progress
        )

    def reconstruct_streaming(
        self, chunks, fit_floor, fit_frac, shifts: List[int], progress=None
    ) -> jax.Array:
        """Pass B over an iterator of (start, raw device chunk);
        ``progress(part, start, frame)`` is the live-view hook."""
        on_cpu = jax.default_backend() == "cpu"
        if on_cpu:
            # shape-stable elementwise body (see _recon_raw_lerp)
            ind_l, left_w = build_shift_indices(
                fit_floor, fit_frac, shifts, self.iw
            )
            ind_l = jnp.asarray(ind_l)
            left_w = jnp.asarray(left_w).astype(jnp.float32)
        else:
            Wt = build_raw_weights(
                fit_floor, fit_frac, shifts, self.iw, self.rotate,
                self.upscale,
            )
        parts = []
        for start, c in chunks:
            if on_cpu:
                part = _recon_raw_lerp(
                    c, ind_l, left_w, self.rotate, self.upscale
                )
            else:
                part = _recon_raw(c, Wt, self.rotate, self.upscale)
            parts.append((start, part))
            if progress is not None:
                # orient the last raw frame like the normalizer does
                # (norm[y, x] = raw[x, W-1-y] when rotated)
                f = c[-1].T[::-1] if self.rotate else c[-1]
                progress(part, start, f)
        parts.sort(key=lambda p: p[0])
        # stays on device: downstream stages (ellipse fit downscale, warp,
        # transversalium, products) are device-side; hosts download only
        # for file writes
        out = jnp.concatenate([p for _, p in parts], axis=2)
        if self.frame_count is not None:
            out = out[:, :, : self.frame_count]
        return out


def reconstruct_band(
    band_chunks,
    fit_floor,
    fit_frac,
    shifts: List[int],
    iw_total: int,
    x0: int,
    rotate: bool,
    upscale: bool,
    progress=None,
) -> jax.Array:
    """Pass B over *band* chunks: raw slabs restricted to spectral columns
    [x0, x0+bw) (io/hostreduce.spectral_band) — the minimum-bytes feed for
    hosts with a slow accelerator link.

    Index semantics stay the reference's: clipping happens against the FULL
    spectral width (solex_util.py:117-118) before the band offset.
    """
    ind_l, left_w = build_shift_indices(fit_floor, fit_frac, shifts, iw_total)
    ind_b = ind_l - x0  # band-local columns; in range by band construction
    S, ih = ind_b.shape
    parts = []
    Wt = None
    for start, chunk in band_chunks:
        bw = chunk.shape[1] if rotate else chunk.shape[2]
        if Wt is None:
            cols = np.arange(bw, dtype=np.int32)[None, None, :]
            l = ind_b.T[:, :, None]
            w = left_w[:, None, None]
            W = np.where(cols == l, w, 0.0) + np.where(cols == l + 1, 1.0 - w, 0.0)
            W = W.astype(np.float32)
            if rotate:
                W = W[::-1]
            Wt = jnp.asarray(np.ascontiguousarray(W))
        part = _recon_raw(chunk, Wt, rotate, upscale)
        parts.append((start, part))
        if progress is not None:
            # band-only view of the slit frame (the full frame was never
            # read on this feed path), oriented like the normalizer
            f = chunk[-1].T[::-1] if rotate else chunk[-1]
            progress(part, start, f)
    parts.sort(key=lambda p: p[0])
    return jnp.concatenate([p for _, p in parts], axis=2)
