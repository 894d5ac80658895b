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


def _native_recon_enabled() -> bool:
    """Whether pass B should try the native fused gather loop.

    Shares the library-wide SOLEX_NO_NATIVE escape hatch; the per-chunk
    call itself degrades to the numpy loop when the library is missing.
    """
    import os

    if os.environ.get("SOLEX_NO_NATIVE") == "1":
        return False
    from .native import get_lib

    lib = get_lib()
    return lib is not None and hasattr(lib, "ser_recon_f64")


def _finalize_mean_max(
    acc: np.ndarray, mx: np.ndarray, r: SerReader, frames: int = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Raw-layout (sum, max) -> normalised-orientation (mean u16, max u16).

    ``frames`` overrides the divisor for subsampled accumulations
    (provisional_spectral_band)."""
    if r.flag_rotate:
        acc = np.rot90(acc)
        mx = np.rot90(mx)
    scale = 256 if r.header.pixel_depth == 8 else 1
    n = r.frame_count if frames is None else frames
    mean = ((acc.astype(np.float64) * scale) / n).astype(np.uint16)
    mx16 = mx.astype(np.uint16)
    if r.header.pixel_depth == 8:
        mx16 = mx16 << 8
    return mean, np.ascontiguousarray(mx16)


def host_mean_max_frames(frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/max of an in-memory normalised (F, ih, iw) uint16 stack.

    The host pass A for non-SER sources (AVI) on CPU-only hosts — same
    truncating arithmetic as the reference accumulator
    (solex_util.py:174-188)."""
    n = frames.shape[0]
    acc = frames.sum(axis=0, dtype=np.uint64)
    mean = (acc.astype(np.float64) / n).astype(np.uint16)
    return mean, frames.max(axis=0)


def host_reconstruct_frames(
    frames: np.ndarray,
    fit_floor: np.ndarray,
    fit_frac: np.ndarray,
    shifts,
    progress=None,
    chunk_frames: int = 512,
) -> np.ndarray:
    """Multi-shift recon from an in-memory normalised frame stack.

    float64, reference-exact (the same truncating store as
    host_reconstruct; solex_util.py:113-134) — the pass B companion of
    host_mean_max_frames for non-SER sources."""
    from ..ops.recon import build_shift_indices

    F, ih, iw = frames.shape
    shifts = list(shifts)
    ind_l, _ = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    ind_l = np.asarray(ind_l)
    w_l = 1.0 - np.asarray(fit_frac, dtype=np.float64)
    w_r = np.asarray(fit_frac, dtype=np.float64)
    ys = np.arange(ih)
    out = np.empty((len(shifts), ih, F), dtype=np.uint16)
    # normalised frames index flat as y*iw + il, right neighbour +1; the
    # fused native sweep (same kernel as the SER memmap path) replaces
    # numpy's 2 gather + 3 arithmetic passes — bit-exact by construction
    use_native = (
        frames.dtype == np.uint16
        and frames.strides[-1] == frames.itemsize
        and _native_recon_enabled()
    )
    flat_l = ys[None, :].astype(np.int64) * iw + ind_l.astype(np.int64)
    for start in range(0, F, chunk_frames):
        end = min(start + chunk_frames, F)
        blk = frames[start:end]
        if use_native:
            from .native import native_recon_chunk

            use_native = native_recon_chunk(
                blk, flat_l, 1, w_l, w_r, False, out, start
            )
            if use_native:
                if progress is not None:
                    progress(out[:, :, start:end], start, blk[-1])
                continue
        for si in range(len(shifts)):
            il = ind_l[si]
            left = blk[:, ys, il].astype(np.float64)
            right = blk[:, ys, il + 1].astype(np.float64)
            out[si, :, start:end] = (left * w_l + right * w_r).T.astype(
                np.uint16
            )
        if progress is not None:
            progress(out[:, :, start:end], start, blk[-1])
    return out


def host_mean_max(r: SerReader, chunk_frames: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """Normalised-orientation mean/max of a SER scan, computed on host.

    Fast path: the native fused single-sweep kernel (native/ser_io.cpp)
    — half the host memory traffic of the numpy fallback's two reduction
    passes.  Both produce identical results (uint64 sums, reference
    truncation).
    """
    acc = mx = None
    try:
        from .native import NativeSerReader

        nr = NativeSerReader(r.path)
        try:
            acc, mx = nr.mean_max()
        finally:
            nr.close()
    except Exception:
        pass
    if acc is None:
        h, w = r.header.height, r.header.width
        acc = np.zeros((h, w), dtype=np.uint64)
        mx = np.zeros((h, w), dtype=r.header.dtype)
        for start in range(0, r.frame_count, chunk_frames):
            n = min(chunk_frames, r.frame_count - start)
            raw = r.raw_frames(start, n)
            acc += raw.sum(axis=0, dtype=np.uint64)
            np.maximum(mx, raw.max(axis=0), out=mx)
    return _finalize_mean_max(acc, mx, r)


def _band_rect(r: SerReader, x0: int, x1: int) -> Tuple[int, int, int, int]:
    """Raw-frame rectangle (r0, r1, c0, c1) covering spectral cols [x0, x1).

    Wide-stored scans (flag_rotate) keep the spectral axis on raw ROWS
    (io/ser.py:155-157), tall-stored on raw columns.
    """
    if r.flag_rotate:
        return x0, x1, 0, r.header.width
    return 0, r.header.height, x0, x1


def host_mean_max_band(
    r: SerReader, x0: int, x1: int, chunk_frames: int = 256
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pass A + spectral-band extraction fused into ONE sweep over the scan.

    Returns (mean, max, band) where mean/max match host_mean_max exactly and
    band is the raw-layout slab restricted to spectral columns [x0, x1) —
    identical to stacking extract_band over all frames, but captured while
    each frame is already in cache for the reductions.  The recon (pass B,
    host_reconstruct_from_band) then never touches the full scan again,
    halving the pipeline's host memory traffic vs the reference's two-pass
    structure (Solex_recon.py:61-73).
    """
    r0, r1, c0, c1 = _band_rect(r, x0, x1)
    try:
        from .native import NativeSerReader

        nr = NativeSerReader(r.path)
        try:
            acc, mx, band = nr.mean_max_band(r0, r1, c0, c1)
        finally:
            nr.close()
    except Exception:
        h, w = r.header.height, r.header.width
        acc = np.zeros((h, w), dtype=np.uint64)
        mx = np.zeros((h, w), dtype=r.header.dtype)
        band = np.empty((r.frame_count, r1 - r0, c1 - c0), dtype=r.header.dtype)
        for start in range(0, r.frame_count, chunk_frames):
            n = min(chunk_frames, r.frame_count - start)
            raw = r.raw_frames(start, n)
            acc += raw.sum(axis=0, dtype=np.uint64)
            np.maximum(mx, raw.max(axis=0), out=mx)
            band[start : start + n] = raw[:, r0:r1, c0:c1]
    mean, mx16 = _finalize_mean_max(acc, mx, r)
    return mean, mx16, band


def provisional_spectral_band(
    r: SerReader, shifts, margin: int = 12, target_frames: int = 64
) -> Tuple[int, int]:
    """Estimate the recon's spectral band from a sparse frame subsample.

    The exact band needs the full-mean line fit, which needs pass A — a
    circular dependency for the fused single-sweep path.  A fit on a
    ~target_frames subsample locates the line to well under a pixel of the
    full fit (the line is a high-contrast absorption feature); ``margin``
    columns of slack absorb the residual.  Callers MUST verify coverage
    against the final fit (band_covers) and fall back to a full-scan recon
    when the guess missed — correctness never depends on this estimate.
    """
    from ..geometry.linefit import fit_spectral_line

    F = r.frame_count
    step = max(1, F // target_frames)
    h, w = r.header.height, r.header.width
    acc = np.zeros((h, w), dtype=np.uint64)
    mx = np.zeros((h, w), dtype=r.header.dtype)
    n = 0
    for start in range(0, F, step):
        raw = r.raw_frames(start, 1)
        acc += raw[0]
        np.maximum(mx, raw[0], out=mx)
        n += 1
    mean, mx16 = _finalize_mean_max(acc, mx, r, frames=n)
    lf = fit_spectral_line(mean, mx16)
    return spectral_band(lf.floor, shifts, r.iw, margin=margin)


#: scans below this raw size take the classic full sweep: the subsample +
#: band two-step only pays off when the avoided read is large (override for
#: tests via SOLEX_FASTPASSA_MIN_MB)
FAST_PASSA_MIN_BYTES = 256 * 1024**2


def fast_passa(r: SerReader, shifts, sample_target: int = 64,
               margin: int = None):
    """Two-step pass A: a frame subsample locates the spectral band and the
    sun's vertical extent, then a full-frame-count sweep touches ONLY the
    band bytes — ~1/5 of the scan for a typical Sol'Ex spectral window.

    Returns (LineFit, mean_band, max_band, x0, x1) with a fit BIT-identical
    to the full-sweep fit whenever the banded fit's verification gates pass
    (geometry/linefit.py:fit_spectral_line_banded), or None so the caller
    falls back to the classic full sweep.  The reference reads every byte
    of the scan to compute statistics its fit only consumes near the line
    (solex_util.py:174-188, :223-259); this keeps the result contract and
    drops the traffic.  Requires the native kernels (ser_sample_stats /
    ser_band_stats) — Python striding over a multi-GB memmap would eat the
    win.
    """
    import os

    from ..geometry.linefit import (
        fit_spectral_line,
        fit_spectral_line_banded,
    )

    if os.environ.get("SOLEX_EXACT_PASSA") == "1":
        return None
    if margin is None:
        # band bytes scale with (line span + shift span + 2*margin): 18 is
        # the smallest margin that keeps the banded fit's interiority gates
        # (blur half-window 12 + subsample-vs-final drift headroom) clear
        # on the bench corpus; a too-small margin only costs a verified
        # fallback to the full sweep, never correctness
        try:
            margin = int(os.environ.get("SOLEX_FASTPASSA_MARGIN", "18"))
        except ValueError:
            margin = 18
    default_mb = str(FAST_PASSA_MIN_BYTES // 1024**2)
    try:
        min_bytes = int(
            float(os.environ.get("SOLEX_FASTPASSA_MIN_MB", default_mb))
            * 1024**2
        )
    except ValueError:
        min_bytes = FAST_PASSA_MIN_BYTES
    if r.header.frame_bytes * r.frame_count < min_bytes:
        return None
    try:
        from .native import NativeSerReader

        nr = NativeSerReader(r.path)
    except Exception:
        return None
    try:
        if not hasattr(nr._lib, "ser_band_stats"):
            return None
        step = max(1, r.frame_count // sample_target)
        acc_s, mx_s, n = nr.sample_stats(step)
        mean_sub, max_sub = _finalize_mean_max(acc_s, mx_s, r, frames=n)
        try:
            lf_sub = fit_spectral_line(mean_sub, max_sub)
        except Exception:
            return None
        x0, x1 = spectral_band(lf_sub.floor, shifts, r.iw, margin=margin)
        if (x1 - x0) * 3 >= r.iw:
            return None  # band covers most of the frame: sweep it all
        r0, r1, c0, c1 = _band_rect(r, x0, x1)
        acc_b, mx_b = nr.band_stats(r0, r1, c0, c1)
        mean_band, max_band = _finalize_mean_max(acc_b, mx_b, r)
        lf = fit_spectral_line_banded(mean_band, max_band, x0, r.iw, lf_sub)
        if lf is None:
            return None
        return lf, mean_band, max_band, x0, x1
    finally:
        nr.close()


def band_covers(
    x0: int, x1: int, fit_floor: np.ndarray, fit_frac, shifts, iw: int
) -> bool:
    """True when spectral cols [x0, x1) contain every recon gather index."""
    from ..ops.recon import build_shift_indices

    ind_l, _ = build_shift_indices(fit_floor, fit_frac, list(shifts), iw)
    return int(ind_l.min()) >= x0 and int(ind_l.max()) + 1 <= x1 - 1


def host_reconstruct_from_band(
    r: SerReader,
    band: np.ndarray,
    x0: int,
    fit_floor: np.ndarray,
    fit_frac: np.ndarray,
    shifts,
    chunk_frames: int = 512,
    progress=None,
) -> np.ndarray:
    """host_reconstruct, gathering from a pre-extracted spectral band slab.

    Bit-identical math (float64 interpolation, truncating uint16 store,
    solex_util.py:113-134); only the gather source changes — the compact
    (F, ...) band from host_mean_max_band instead of the full-scan memmap,
    so pass B runs at cache speed with zero page-cache pressure.  Callers
    must have checked band_covers() first.
    """
    from ..ops.recon import build_shift_indices

    ih, iw = r.ih, r.iw
    F = r.frame_count
    shifts = list(shifts)
    S = len(shifts)
    ind_l, _ = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    w_l = 1.0 - np.asarray(fit_frac, dtype=np.float64)
    w_r = np.asarray(fit_frac, dtype=np.float64)
    upscale = r.header.pixel_depth == 8
    out = np.empty((S, ih, F), dtype=np.uint16)

    il64 = ind_l.astype(np.int64) - x0  # band-local spectral index
    bw = band.shape[1] if r.flag_rotate else band.shape[2]
    if r.flag_rotate:
        # band frame (bw_spectral, W_spatial): norm[y] = band[il-x0, W-1-y]
        W = r.header.width
        yrev = np.arange(ih - 1, -1, -1, dtype=np.int64)
        flat_l = il64 * W + yrev[None, :]
        right_off = W
    else:
        # band frame (H_spatial, bw_spectral)
        rows = np.arange(ih, dtype=np.int64)
        flat_l = rows[None, :] * bw + il64
        right_off = 1

    use_native = _native_recon_enabled()
    # live-view frame: last frame of the chunk, oriented like the
    # normalizer (norm[y, x] = raw[x, W-1-y] when rotated)
    _f = (lambda c: c[-1].T[::-1]) if r.flag_rotate else (lambda c: c[-1])
    left = np.empty((chunk_frames, ih), dtype=band.dtype)
    right = np.empty_like(left)
    vals = np.empty((chunk_frames, ih), dtype=np.float64)
    tmp = np.empty_like(vals)
    for start in range(0, F, chunk_frames):
        n = min(chunk_frames, F - start)
        chunk = band[start : start + n]
        if use_native:
            from .native import native_recon_chunk

            use_native = native_recon_chunk(
                chunk, flat_l, right_off, w_l, w_r, upscale, out, start
            )
            if use_native:
                if progress is not None:
                    progress(out[:, :, start : start + n], start, _f(chunk))
                continue
        raw2 = chunk.reshape(n, -1)
        for si in range(S):
            np.take(raw2, flat_l[si], axis=1, out=left[:n])
            np.take(raw2, flat_l[si] + right_off, axis=1, out=right[:n])
            np.multiply(left[:n], w_l, out=vals[:n])
            np.multiply(right[:n], w_r, out=tmp[:n])
            np.add(vals[:n], tmp[:n], out=vals[:n])
            if upscale:
                vals[:n] *= 256.0
            out[si, :, start : start + n] = vals[:n].T
        if progress is not None:
            progress(out[:, :, start : start + n], start, _f(chunk))
    return out


def host_reconstruct(
    r: SerReader,
    fit_floor: np.ndarray,
    fit_frac: np.ndarray,
    shifts,
    chunk_frames: int = 512,
    progress=None,
) -> np.ndarray:
    """Multi-shift disk reconstruction on the host, float64, reference-exact.

    The minimum-relay-bytes pass B: gathers the two interpolation neighbours
    straight out of the SER memmap's page cache (no band copy, no transfer)
    and reproduces the reference's float64 arithmetic and truncating uint16
    store bit-for-bit (solex_util.py:113-134).  Only the tiny (S, ih, F)
    disks ever cross the accelerator link.  Chosen by the feed policy when
    the link's sustained rate makes shipping the scan (or even its spectral
    band) slower than ~1 s of host gathers; on normally-attached TPUs the
    device kernels (ops/recon.py) win and are chosen instead.
    """
    from ..ops.recon import build_shift_indices

    ih, iw = r.ih, r.iw
    F = r.frame_count
    shifts = list(shifts)
    S = len(shifts)
    ind_l, _ = build_shift_indices(fit_floor, fit_frac, shifts, iw)
    w_l = 1.0 - np.asarray(fit_frac, dtype=np.float64)   # (ih,)
    w_r = np.asarray(fit_frac, dtype=np.float64)
    upscale = r.header.pixel_depth == 8
    out = np.empty((S, ih, F), dtype=np.uint16)

    # flattened per-frame gather indices (raw frame viewed as one row):
    # rotate: norm[y, x] = raw[x, W-1-y] (fused.py header) -> il[y]*W+(W-1-y),
    # right neighbour one raw ROW over (+W); else y*W+il[y], right +1
    W = r.header.width
    il64 = ind_l.astype(np.int64)
    if r.flag_rotate:
        yrev = np.arange(ih - 1, -1, -1, dtype=np.int64)
        flat_l = il64 * W + yrev[None, :]        # (S, ih)
        right_off = W
    else:
        rows = np.arange(ih, dtype=np.int64)
        flat_l = rows[None, :] * W + il64
        right_off = 1

    # all per-chunk temporaries are preallocated and reused: on hosts whose
    # anonymous-memory allocation is token-bucket throttled, per-chunk fresh
    # buffers (not the math) dominate the pass — see docs/PERF.md
    use_native = _native_recon_enabled()
    # live-view frame: last frame of the chunk, oriented like the
    # normalizer (norm[y, x] = raw[x, W-1-y] when rotated)
    _f = (lambda c: c[-1].T[::-1]) if r.flag_rotate else (lambda c: c[-1])
    left = np.empty((chunk_frames, ih), dtype=r.header.dtype)
    right = np.empty_like(left)
    vals = np.empty((chunk_frames, ih), dtype=np.float64)
    tmp = np.empty_like(vals)
    for start in range(0, F, chunk_frames):
        n = min(chunk_frames, F - start)
        raw = r.raw_frames(start, n)             # memmap view, zero-copy
        if use_native:
            from .native import native_recon_chunk

            # fused native gather straight off the memmap page cache —
            # one sweep instead of numpy's 2 gather + 3 arithmetic passes
            use_native = native_recon_chunk(
                raw, flat_l, right_off, w_l, w_r, upscale, out, start
            )
            if use_native:
                if progress is not None:
                    progress(out[:, :, start : start + n], start, _f(raw))
                continue
        raw2 = raw.reshape(n, -1)
        for si in range(S):
            np.take(raw2, flat_l[si], axis=1, out=left[:n])
            np.take(raw2, flat_l[si] + right_off, axis=1, out=right[:n])
            # float64 like the reference (solex_util.py:122-134)
            np.multiply(left[:n], w_l, out=vals[:n])
            np.multiply(right[:n], w_r, out=tmp[:n])
            np.add(vals[:n], tmp[:n], out=vals[:n])
            if upscale:
                vals[:n] *= 256.0
            out[si, :, start : start + n] = vals[:n].T  # truncating u16 store
        if progress is not None:
            progress(out[:, :, start : start + n], start, _f(raw))
    return out


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
