"""End-to-end single-file pipeline: read -> reconstruct -> correct -> products.

reference: Solex_recon.py:49-174 (solex_read / solex_process /
single_image_process).  The device does all image-sized work; the host does
file I/O and the tiny fits/matrices.

TPU data flow for one scan:

  host mmap SER -> chunked uint16 slabs -> HBM
      device: int32 sum + max over frames        (ops/reduce.py)
      host:   cubic line fit (float64)           (geometry/linefit.py)
      device: multi-shift recon matmul           (ops/recon.py)
      host:   ellipse fit on edge points         (geometry/…)
      device: circularisation warp, row-gain transversalium, CLAHE, stretches
      host:   FITS/PNG writes
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..config import Options, output_path
from ..geometry import ellipse_to_circle, fit_spectral_line
from ..geometry.correct import correct_image, NO_CIRCLE, Circle
from ..io.fits import make_header, write_fits
from ..io.video import open_video
from ..ops.recon import StreamingRecon
from ..ops.reduce import MeanMaxAccumulator
from ..utils.log import RunLog
from ..utils.timer import StageTimer
from .products import crop_width, image_process
from .plots import (
    save_ellipse_fit_plot,
    save_spectral_line_plot,
    save_transversalium_plot,
)
from .transversalium import correct_transversalium
from .vignette import remove_vignette


# escape hatch for A/B testing the vmapped sweep path against the
# sequential one (tests/test_sweep_batched.py)
_SWEEP_BATCHED = True


def _live_view(shifts, options):
    """Per-chunk live display of the slit frame + shift-0 disk build-up.

    reference: solex_util.py:136-143 shows the current raw frame and the
    growing disk every 10 frames; the TPU pipeline reconstructs in
    chunks, so the natural granularity here is one refresh per chunk
    (deviation documented in docs/PARITY.md).  Headless environments
    no-op inside utils.display.
    """
    if not options.flag_display:
        return None
    from ..utils.display import show

    zi = shifts.index(0)
    # Chunked recon paths hand the callback only the CURRENT chunk
    # (S, ih, chunk_n) at its start offset; accumulate into a host-side
    # canvas so the window shows the growing disk, not an isolated strip.
    # The canvas persists across calls (one per scan — _live_view is
    # constructed per read_scan invocation).
    state = {"canvas": None}

    def cb(arr, start, frame=None):
        if frame is not None:
            # the reference's 'image' window: the chunk's last slit frame
            # (band feeds show the spectral-band crop — the full frame
            # was never read on those paths)
            show("image", np.asarray(frame))
        a = np.asarray(arr[zi])         # download one shift's plane only
        end = start + a.shape[1]
        c = state["canvas"]
        if c is None or c.shape[0] != a.shape[0]:
            c = np.zeros((a.shape[0], end), a.dtype)
        elif c.shape[1] < end:
            c = np.concatenate(
                [c, np.zeros((c.shape[0], end - c.shape[1]), c.dtype)], axis=1
            )
        c[:, start:end] = a
        state["canvas"] = c
        show("disk", c)

    return cb


class _NoFeedMonitor:
    """Inert FeedRateMonitor stand-in for sources with no host fallback."""

    def note_chunk(self, chunk):
        pass


_NO_MONITOR = _NoFeedMonitor()


@dataclass
class ScanResult:
    """Everything solex_read produces (reference: Solex_recon.py:49-83)."""

    disk_list: object                # (S, ih, F) uint16 — device (jax) array
                                     # on the fused/band paths; on the host
                                     # feed a LIST of per-shift (ih, F)
                                     # arrays (device for requested shifts,
                                     # host np for fit-only ones); np array
                                     # otherwise
    shifts: List[int]                # augmented shift list
    shift_requested: List[int]
    backup_bounds: Tuple[int, int]
    header: dict
    basefich0: str
    mean_img: np.ndarray = None
    linefit: object = None
    # the feed policy's placement decisions for THIS scan; the
    # post-processing stage re-asserts them on whatever thread runs it
    small_ops_host: bool = False
    host_pipeline: bool = False


def read_scan(file: str, options: Options, timer: Optional[StageTimer] = None) -> ScanResult:
    """Read a scan and reconstruct the per-shift disks.

    reference: Solex_recon.py:49-83 — prepends the hidden
    [ellipse_fit_shift, 0] shifts (deduplicated), computes the mean/fit, and
    runs the hot recon; saves ``_mean.fits`` / ``_raw.fits`` products.
    """
    timer = timer or StageTimer()
    basefich0 = os.path.splitext(file)[0]
    options.basefich0 = basefich0
    log = RunLog(basefich0, options)
    log.clear()
    log("Pixel shift : " + str(options.shift))
    requested = list(options.shift)
    options.shift_requested = requested
    shifts = list(dict.fromkeys([options.ellipse_fit_shift, 0] + requested))

    with timer.stage("open"):
        vid = open_video(file)
    hdr = make_header(vid.iw, vid.ih)
    log(f"Width, Height : {vid.Width} {vid.Height}")
    log(f"Number of frames : {vid.frame_count}")

    from ..io.feeder import device_chunks, probe_transfer_rate, raw_device_chunks
    from ..io.video import _SerVideo
    from ..ops.fused import RawScanProcessor
    from ..parallel.mesh import frame_sharding, mesh_from_options, replicated

    # Options.mesh names a ('batch', 'frame') device mesh; within one scan
    # the frame axis is the zero-communication direction (SURVEY.md §5.7):
    # every feed below splits its chunks over 'frame', the mean/max fold
    # reduces with one psum over ICI, and the recon contraction is local.
    mesh = mesh_from_options(options.mesh)
    fshard = frame_sharding(mesh) if mesh is not None else None

    keep_resident = vid.frame_count * vid.ih * vid.iw * 2 <= 4 * 1024**3
    total_bytes = vid.frame_count * vid.ih * vid.iw * 2
    raw_proc = None
    band_mode = False
    chunks = []

    # Feed policy — how many bytes cross the accelerator link:
    #   device: whole slab to HBM, full device pipeline (normal TPU hosts)
    #   band:   host pass A, only the recon's spectral band transferred
    #   host:   host pass A + host float64 recon; only the (S, ih, F) disks
    #           (~1000x smaller than the scan) ever cross the link
    # The probe reads an optimistic burst-biased rate on token-bucket links,
    # so for big scans anything under the device threshold goes straight to
    # "host" — the band's ~100 MB is bucket-sized, a gamble "host" never
    # takes for ~0.5 s of page-cache gathers.
    import jax

    feed = options.feed_mode
    if (feed == "auto" and options.mesh is None
            and jax.default_backend() == "cpu"
            and (isinstance(vid, _SerVideo) or total_bytes <= 1024**3)):
        # no accelerator: a "device" feed would just memcpy the scan into
        # XLA:CPU buffers and rot90/normalise it there — strictly worse
        # than the host pass (SER: native single-sweep mean/max + float64
        # recon straight off the memmap, pass A 5.1 s -> ~0.5 s on the
        # bench scan; non-SER: the in-memory pass, a 200-frame AVI
        # dropped 117 -> ~25 ms).  Non-SER sources above 1 GB keep the
        # chunked path (read_all would materialise the whole stack).
        # A mesh request keeps the sharded device feed: virtual CPU
        # meshes exist exactly to exercise that path.
        feed = "host"
    if (feed == "auto" and options.mesh is None
            and (isinstance(vid, _SerVideo) or total_bytes <= 1024**3)):
        # the downlink is dead or trickling (each relay direction has its
        # own weather): every device stage ends in a readback, so the
        # host pass is the only path that can finish — regardless of what
        # the upload probe says.  ALL source types: a mixed SER+AVI batch
        # routed only its SER files here and the AVI files' readbacks
        # dragged a 0.9 s batch to 35 s (same >1 GB non-SER carve-out as
        # the CPU-backend branch above: read_all would materialise it)
        from ..io.feeder import d2h_responsive

        if not d2h_responsive():
            print("WARNING: device->host readback unresponsive; "
                  "taking the host feed path")
            feed = "host"
    if feed == "auto" and isinstance(vid, _SerVideo):
        if total_bytes > 256 * 1024**2:
            rate = probe_transfer_rate()
            feed = "host" if rate < 200e6 else "device"
        else:
            # small scans aren't worth a fresh ~50 MB probe, but a folder
            # batch's earlier probe (memoised) is free to consult — and once
            # the batch has cumulatively fed more than a probe costs, one
            # real probe pays for itself
            from ..io.feeder import cached_probe_rate, note_small_scan

            rate = cached_probe_rate()
            if rate is None and note_small_scan(total_bytes) > 256 * 1024**2:
                rate = probe_transfer_rate()
            if rate is not None and rate < 200e6:
                feed = "host"

    from ..utils.placement import set_host_pipeline, set_small_ops_on_host

    small_ops_host = feed in ("band", "host")
    set_small_ops_on_host(small_ops_host)  # this (reading) thread
    # "host" (not "band"): disks end up host-side, so the bulk post-
    # processing (warp, row stats, products) also stays host — the link
    # carries nothing after recon on throttled-relay hosts
    host_pipe = feed == "host"
    set_host_pipeline(host_pipe)

    pinned = False
    if feed in ("band", "host") and isinstance(vid, _SerVideo):
        # host feeds sweep the file at least twice (pass A + pass B); pin
        # its pages so a cache-pressured kernel doesn't make every pass a
        # throttled disk re-read (io/pagecache.py, best-effort)
        from ..io.pagecache import pin

        pinned = pin(file)

    # Fused single-sweep pass A ("host" feed): a provisional line fit on a
    # sparse frame subsample locates the spectral band, and the native sweep
    # extracts it WHILE computing mean/max — pass B then gathers from the
    # compact band slab instead of the scan's memmap.  Worth it ONLY when
    # the page cache cannot be trusted to hold the scan between passes
    # (pin() failed on a big file): the memmap gather itself already touches
    # just the band's pages, so with a warm pinned cache the extra slab is
    # pure overhead.  Coverage is verified against the real (full-mean) fit
    # before use; a miss falls back to the classic full-scan recon, so
    # results are always identical.
    fused_band = None  # (band_slab, x0, x1)
    want_fused = (
        os.environ.get("SOLEX_FUSEDBAND") == "1"
        or (not pinned and total_bytes > 256 * 1024**2)
    ) and os.environ.get("SOLEX_NO_FUSEDBAND") != "1"
    # Two-step fast pass A (host feed): a frame subsample locates the
    # spectral band and the sun's extent, then the full-frame-count native
    # sweep reads ONLY the band bytes (~1/5 of the scan) and the banded fit
    # verifies bit-identity gates against the subsample's full-width view
    # (io/hostreduce.py:fast_passa).  Disabled when save_fit requests the
    # _mean.fits data product — that needs the true full mean inline.  A
    # figure mode does NOT disable it: the _spectral_line_data.png plot is
    # the full mean's only other consumer and it already renders on the
    # deferred figure lane (io/writers.py), so the full-frame mean sweep
    # rides that lane too (pipeline/plots.py:deferred_spectral_line_plot,
    # byte-identical figure asserted in tests/test_hostrecon.py) instead
    # of costing the critical path a second full-file pass.
    fast_lf = None  # verified LineFit from the banded fast pass A
    plot_wanted = (
        not options.clahe_only and not options.protus_only
        and not options._nolog
    )
    want_fast = (
        feed == "host"
        and isinstance(vid, _SerVideo)
        and not options.save_fit
        and os.environ.get("SOLEX_NO_FASTPASSA") != "1"
    )
    mem_frames = None
    with timer.stage("mean/max"):
        if feed == "host" and not isinstance(vid, _SerVideo):
            from ..io.hostreduce import host_mean_max_frames

            mem_frames = vid.read_all()
            mean_img, max_img = host_mean_max_frames(mem_frames)
        elif feed in ("band", "host") and isinstance(vid, _SerVideo):
            from ..io.hostreduce import (
                fast_passa,
                host_mean_max,
                host_mean_max_band,
                provisional_spectral_band,
            )

            band_mode = True
            r = vid._r
            if want_fast:
                try:
                    fast = fast_passa(r, shifts)
                except Exception:
                    fast = None
                if fast is not None:
                    fast_lf, mean_img, max_img = fast[0], None, None
            if fast_lf is None and feed in ("host", "band") and want_fused:
                try:
                    x0p, x1p = provisional_spectral_band(r, shifts)
                    band_bytes = (
                        (x1p - x0p) * r.ih * r.frame_count
                        * r.header.dtype.itemsize
                    )
                    if band_bytes <= min(total_bytes // 3, 768 * 1024**2):
                        mean_img, max_img, band_slab = host_mean_max_band(
                            r, x0p, x1p
                        )
                        fused_band = (band_slab, x0p, x1p)
                except Exception:
                    fused_band = None
            if fast_lf is None and fused_band is None:
                mean_img, max_img = host_mean_max(vid._r)
        else:
            from ..io.feeder import FeedCollapse, FeedRateMonitor

            # token-bucket links pass the up-front probe on burst credit and
            # can collapse mid-scan; the monitor bails the device pass early
            # and the except arm restarts it on the host path.  Only SER
            # sources have a host pass to restart on, so only they watch.
            # The monitor counts actual raw chunk bytes, so its total must
            # be raw file bytes too (total_bytes is normalized-u16
            # accounting — 2x the truth for 8-bit scans, which would
            # inflate the remaining-work guard).
            monitor = (
                FeedRateMonitor(vid._r.header.frame_bytes * vid.frame_count)
                if isinstance(vid, _SerVideo) else _NO_MONITOR
            )
            # a scan that fits in one ~96 MB put is unmonitorable (the
            # watchdog measures blocked inter-chunk progress) — chunk small
            # scans to ~1/6 of the scan so a trickle link is caught after
            # two chunks instead of ridden for the whole transfer.  Pass-B
            # arithmetic is immune to this choice: RawScanProcessor merges
            # resident small scans to one canonical slab before recon.
            feed_chunk = options.frame_chunk
            if isinstance(vid, _SerVideo):
                raw_total = vid._r.header.frame_bytes * vid.frame_count
                if raw_total <= 6 * 96 * 1024 * 1024:
                    feed_chunk = min(
                        feed_chunk, max(1, vid.frame_count // 6)
                    )
            try:
                try:
                    raw_iter, rotate, upscale = raw_device_chunks(
                        vid, feed_chunk, fshard
                    )
                except TypeError:
                    raw_iter = None
                if raw_iter is not None:
                    # fused raw-layout path: no normalisation pass over slab
                    raw_proc = RawScanProcessor(
                        vid.Height, vid.Width, rotate, upscale,
                        frame_count=vid.frame_count, mesh=mesh,
                    )
                    for start, chunk in raw_iter:
                        raw_proc.accumulate(start, chunk, keep=keep_resident)
                        monitor.note_chunk(chunk)
                    mean_img, max_img = raw_proc.mean_max()
                else:
                    acc = MeanMaxAccumulator()
                    for start, chunk in device_chunks(
                        vid, feed_chunk, fshard
                    ):
                        acc.update(chunk)
                        monitor.note_chunk(chunk)
                        if keep_resident:
                            chunks.append((start, chunk))
                    mean_img, max_img = acc.result()
            except FeedCollapse as e:
                if not isinstance(vid, _SerVideo):
                    raise
                print(f"WARNING: device feed collapsed mid-scan ({e}); "
                      "restarting pass A on the host path")
                log(f"Device feed collapsed mid-scan ({e}); host fallback")
                from ..io.feeder import note_collapse
                from ..io.hostreduce import host_mean_max
                from ..io.pagecache import pin

                # the measured sustained rate beats any probe burst sample:
                # later files / re-runs in this process go host directly
                note_collapse(getattr(e, "rate", None))

                feed = "host"
                band_mode = True
                small_ops_host = True
                set_small_ops_on_host(True)
                host_pipe = True
                set_host_pipeline(True)
                pin(file)
                raw_proc = None
                chunks = []
                mean_img, max_img = host_mean_max(vid._r)
        # sync inside the stage: the fit consumes these immediately, and an
        # async tail would misattribute pass A time to the line fit (a no-op
        # for the host paths' numpy arrays)
        import jax

        if fast_lf is None:
            mean_img, max_img = jax.block_until_ready((mean_img, max_img))

    if options.save_fit:
        from ..io.writers import submit as submit_write

        submit_write(
            write_fits, output_path(basefich0 + "_mean.fits", options),
            mean_img, hdr,
        )

    with timer.stage("line fit"):
        lf = fast_lf if fast_lf is not None else fit_spectral_line(
            mean_img, max_img
        )
    log(f"Vertical limits y1, y2 : {lf.y1} {lf.y2}")
    log("Spectral line polynomial fit: " + str(lf.poly))

    if plot_wanted:
        from ..io.writers import submit_figure

        if mean_img is None:
            # banded fast pass: the full mean exists nowhere yet — sweep
            # it inside the deferred render (same host_mean_max call the
            # inline path makes, so the figure bytes are identical)
            from .plots import deferred_spectral_line_plot

            submit_figure(
                deferred_spectral_line_plot,
                output_path(basefich0 + "_spectral_line_data.png", options),
                file, lf,
            )
        else:
            submit_figure(
                save_spectral_line_plot,
                output_path(basefich0 + "_spectral_line_data.png", options),
                mean_img, lf,
            )

    with timer.stage("recon"):
        if mem_frames is not None:
            from ..io.hostreduce import host_reconstruct_frames

            disk_list = host_reconstruct_frames(
                mem_frames, lf.floor, lf.frac, shifts,
                progress=_live_view(shifts, options),
            )
            mem_frames = None
        elif feed == "host" and band_mode:
            import jax

            from ..io.hostreduce import (
                band_covers,
                host_reconstruct,
                host_reconstruct_from_band,
            )

            live = _live_view(shifts, options)
            if fused_band is not None and band_covers(
                fused_band[1], fused_band[2], lf.floor, lf.frac, shifts, vid.iw
            ):
                disk_list = host_reconstruct_from_band(
                    vid._r, fused_band[0], fused_band[1],
                    lf.floor, lf.frac, shifts, progress=live,
                )
            else:
                disk_list = host_reconstruct(
                    vid._r, lf.floor, lf.frac, shifts, progress=live
                )
            fused_band = None  # release the slab
            if mesh is None and not host_pipe:
                # start (async) uploads now for the shifts whose disks the
                # post-processing warps — overlapped with the remaining host
                # work.  Shifts that yield no product (the hidden fit shift)
                # stay host-side: the ellipse fit runs on a host downscale
                # and their 8 MB never crosses the link.  Oversized sweeps
                # stop uploading at the budget and go per-shift on demand.
                # (host_pipe: the warp/products run host-side — a committed
                # accelerator array would drag the warp back onto the
                # device, re-paying the link this mode exists to avoid.)
                budget = 96 * 1024 * 1024
                per_shift = []
                for i, s in enumerate(shifts):
                    d = disk_list[i]
                    if s in requested and d.nbytes <= budget:
                        budget -= d.nbytes
                        d = jax.device_put(d)
                    per_shift.append(d)
                disk_list = per_shift
        elif band_mode:
            import jax

            from ..io.feeder import (
                auto_chunk_frames,
                _fit_chunk_to_shards,
                prefetch_iter,
            )
            from ..io.hostreduce import extract_band, spectral_band
            from ..ops.fused import reconstruct_band

            r = vid._r
            x0, x1 = spectral_band(lf.floor, shifts, vid.iw)
            bw = x1 - x0
            band_frame_bytes = bw * vid.ih * r.header.dtype.itemsize
            chunk_n = _fit_chunk_to_shards(
                auto_chunk_frames(band_frame_bytes, options.frame_chunk * 8),
                fshard,
            )

            from ..io.feeder import pad_to_bucket

            # serve the transfer source from the fused sweep's slab when it
            # covers the final band — the per-chunk extracts then never
            # touch the (possibly evicted) scan again
            slab = None
            if fused_band is not None and (
                fused_band[1] <= x0 and x1 <= fused_band[2]
            ):
                b, bx0, _ = fused_band
                if r.flag_rotate:
                    slab = b[:, x0 - bx0 : x1 - bx0, :]
                else:
                    slab = b[:, :, x0 - bx0 : x1 - bx0]

            # the band transfer (~100 MB) rides the same link the probe
            # rated: watch it too, with the host float64 recon as fallback
            from ..io.feeder import FeedCollapse, FeedRateMonitor

            band_total = band_frame_bytes * r.frame_count
            band_monitor = FeedRateMonitor(
                band_total,
                min_sample_bytes=max(band_total // 4, 8 * 1024 * 1024),
                min_remaining_bytes=max(band_total // 4, 8 * 1024 * 1024),
            )

            def band_chunks():
                for start in range(0, r.frame_count, chunk_n):
                    n = min(chunk_n, r.frame_count - start)
                    if slab is not None:
                        band = pad_to_bucket(
                            np.ascontiguousarray(slab[start : start + n]),
                            chunk_n,
                        )
                    else:
                        band = pad_to_bucket(
                            extract_band(r, x0, x1, start, n), chunk_n
                        )
                    dev = jax.device_put(band, fshard)
                    band_monitor.note_chunk(dev)
                    yield start, dev

            try:
                # double-buffered: a background thread extracts + stages
                # chunk k+1 while the device matmuls chunk k
                disk_list = reconstruct_band(
                    prefetch_iter(band_chunks()), lf.floor, lf.frac, shifts,
                    vid.iw, x0, r.flag_rotate, r.header.pixel_depth == 8,
                    progress=_live_view(shifts, options),
                )[:, :, : vid.frame_count]
            except FeedCollapse as e:
                print(f"WARNING: band feed collapsed mid-scan ({e}); "
                      "reconstructing on the host path")
                log(f"Band feed collapsed mid-scan ({e}); host recon")
                from ..io.feeder import note_collapse
                from ..io.hostreduce import host_reconstruct

                note_collapse(getattr(e, "rate", None))
                disk_list = host_reconstruct(r, lf.floor, lf.frac, shifts)
                disk_list = jax.device_put(disk_list)
            fused_band = None  # release the slab
        elif raw_proc is not None:
            live = _live_view(shifts, options)
            if keep_resident:
                disk_list = raw_proc.reconstruct(
                    lf.floor, lf.frac, shifts, progress=live
                )
            else:
                raw_iter, _, _ = raw_device_chunks(
                    vid, options.frame_chunk, fshard
                )
                disk_list = raw_proc.reconstruct_streaming(
                    raw_iter, lf.floor, lf.frac, shifts, progress=live
                )
        else:
            recon = StreamingRecon(
                shifts, lf.floor, lf.frac, kernel=options.recon_kernel,
                progress=_live_view(shifts, options),
            )
            if keep_resident:
                for start, chunk in chunks:
                    recon.update(start, chunk)
            else:
                for start, chunk in device_chunks(vid, options.frame_chunk, fshard):
                    recon.update(start, chunk)
            disk_list = recon.result()
        if not isinstance(disk_list, list):
            # attribution sync (device/band feeds): the ellipse fit's
            # downscale pull would otherwise absorb the recon's async tail.
            # The host feed's per-shift list keeps its uploads async — the
            # overlap with _raw.fits writes and the host-side fit is real.
            import jax

            disk_list = jax.block_until_ready(disk_list)

    if mesh is not None:
        # gather the disks once: (S, ih, F) is ~1000x smaller than the scan,
        # and the post-processing chain (ellipse fit, warp, transversalium,
        # products) operates on whole disks
        import jax

        disk_list = jax.device_put(disk_list, replicated(mesh))

    if options.flip_x:
        if isinstance(disk_list, list):
            disk_list = [d[:, ::-1] for d in disk_list]
        else:
            disk_list = disk_list[:, :, ::-1]

    # recon width (reference :65)
    hdr["NAXIS1"] = disk_list[0].shape[1] if isinstance(
        disk_list, list
    ) else disk_list.shape[2]
    if options.save_fit:
        from ..io.writers import submit as submit_write

        for i, s in enumerate(shifts):
            if s in requested:
                base = basefich0 + f"_shift={s}"
                submit_write(
                    write_fits, output_path(base + "_raw.fits", options),
                    disk_list[i], hdr,
                )

    return ScanResult(
        disk_list=disk_list,
        shifts=shifts,
        shift_requested=requested,
        backup_bounds=(lf.y1, lf.y2),
        header=hdr,
        basefich0=basefich0,
        mean_img=mean_img,
        linefit=lf,
        small_ops_host=small_ops_host,
        host_pipeline=host_pipe,
    )


def _transversalium_geometry(circle: Circle, borders, backup_bounds, width: int):
    """Correction geometry: the fitted circle, or the detect_bord backup
    band when no ellipse was fitted (reference: Solex_recon.py:145-146)."""
    if circle != NO_CIRCLE:
        return circle, borders
    return (0, 0, 99999), [
        0, backup_bounds[0] + 20, width - 1, backup_bounds[1] - 20,
    ]


def single_image_process(
    frame: np.ndarray,
    hdr: dict,
    options: Options,
    circle: Circle,
    borders,
    basefich: str,
    backup_bounds: Tuple[int, int],
    save: bool = True,
):
    """Per-shift post-processing after circularisation.

    reference: Solex_recon.py:136-174.
    """
    from ..io.writers import submit as submit_write

    if save and options.save_fit:
        submit_write(
            write_fits,
            output_path(basefich + "_circular.fits", options), frame, hdr,
        )

    if options.transversalium:
        tr_circle, tr_borders = _transversalium_geometry(
            circle, borders, backup_bounds, frame.shape[1]
        )
        show_plot = (
            save
            and not options.clahe_only
            and not options.protus_only
            and not options._nolog
        )
        # Fast path: nothing consumes the detransversaliumed intermediate
        # (no fits write, no crop, no stubborn filter), so the row-gain
        # multiply fuses into the product program — one device dispatch
        # instead of two.  Bit-identical only for integer inputs (the float
        # de-vignette path casts before vs after the multiply), so gate on
        # dtype.
        fuse = (
            not options.stubborn_transversalium
            and not (save and options.save_fit)
            and options.fixed_width is None
            and not options.crop_width_square
            and np.issubdtype(frame.dtype, np.integer)
        )
        if fuse:
            from .transversalium import transversalium_gain

            c, _, _, _ = transversalium_gain(
                frame, tr_circle, tr_borders, options.trans_strength
            )
        else:
            detrans, c = correct_transversalium(
                frame, tr_circle, tr_borders,
                trans_strength=options.trans_strength,
                stubborn=options.stubborn_transversalium,
            )
        if show_plot:
            from ..io.writers import submit_figure

            submit_figure(
                save_transversalium_plot,
                output_path(basefich + "_transversalium_correction.png", options),
                c,
            )
        if fuse:
            return image_process(
                frame, circle, options, hdr, basefich, save=save, gain=c
            )
    else:
        detrans = frame

    if save and options.save_fit and options.transversalium:
        submit_write(
            write_fits,
            output_path(basefich + "_detransversaliumed.fits", options),
            detrans, hdr,
        )

    if options.fixed_width is not None or options.crop_width_square:
        detrans, circle = crop_width(np.asarray(detrans), circle, options)
    return image_process(detrans, circle, options, hdr, basefich, save=save)


def process_scan(scan: ScanResult, options: Options, timer: Optional[StageTimer] = None):
    """Geometric + photometric corrections and products for every shift.

    reference: Solex_recon.py:93-133 (solex_process).
    """
    timer = timer or StageTimer()
    from ..utils.placement import set_host_pipeline, set_small_ops_on_host

    # may run on a pool thread (cli/main.py decode/process overlap):
    # re-assert this scan's placement decisions thread-locally
    set_small_ops_on_host(scan.small_ops_host)
    set_host_pipeline(scan.host_pipeline)
    basefich0 = scan.basefich0
    log = RunLog(basefich0, options)
    if options.transversalium:
        log("Transversalium correction : " + str(options.trans_strength))
    else:
        log("Transversalium disabled")
    log("Mirror X : " + str(options.flip_x))
    log("Post-rotation : " + str(options.img_rotate) + " degrees")
    log(f"Protus adjustment : {options.delta_radius}")
    log(f"de-vignette : {options.de_vignette}")

    borders = [0, 0, 0, 0]
    circle: Circle = NO_CIRCLE
    results = []

    # Doppler sweeps warp every requested shift with the SAME correction
    # (Solex_recon.py:120-123): batch those warps into one vmapped program.
    # The fit pass (if any) happens at the first loop index and sets
    # ratio/slant, so the batchable set is known only lazily.
    batched_warps = {}

    # ...and the post-processing (transversalium row stats + product core)
    # batches the same way when per-shift shapes stay uniform — i.e. no
    # host-side crop/de-vignette/stubborn steps in between (_finish_sweep)
    sweep_eligible = (
        _SWEEP_BATCHED
        and sum(1 for s in scan.shifts if s in scan.shift_requested) >= 2
        and not options.stubborn_transversalium
        and not options.de_vignette
        and options.fixed_width is None
        and not options.crop_width_square
    )
    pending_sweep = []

    def batch_warp_pending(start_index: int, ratio: float, phi: float, log=None) -> None:
        idxs = [
            j
            for j in range(start_index, len(scan.shifts))
            if scan.shifts[j] in scan.shift_requested
        ]
        if len(idxs) < 2:
            return
        from ..geometry.correct import correct_images_batched
        import jax.numpy as jnp

        from ..utils.placement import host_pipeline

        if host_pipeline():
            # keep the disks numpy (jnp.asarray would commit them to the
            # accelerator and drag the warp back across the link) and pass
            # a LIST — the host warp writes each shift into one
            # preallocated output stack, no input stack copy
            stack = [np.asarray(scan.disk_list[j]) for j in idxs]
        else:
            stack = jnp.stack([jnp.asarray(scan.disk_list[j])
                               for j in idxs])
        with timer.stage("warp"):
            warped, _, _ = correct_images_batched(stack, phi, ratio, log=log)
        for pos, j in enumerate(idxs):
            batched_warps[j] = warped[pos]

    for i, s in enumerate(scan.shifts):
        flag_requested = s in scan.shift_requested
        basefich = basefich0 + f"_shift={s}"
        frame_circularized = None
        if options.ratio_fixe is None and options.slant_fix is None:
            # first pass: full ellipse fit on the high-contrast disk
            plots_on = (
                not options.clahe_only
                and not options.protus_only
                and not options._nolog
            )
            try:
                with timer.stage("ellipse fit"):
                    # the hidden fit shift usually yields no product: skip
                    # its circularisation warp (and, on the host feed, the
                    # whole disk upload) — only the geometry is needed,
                    # unless the _ellipse_fit.png diagnostic will show the
                    # corrected image
                    geo = ellipse_to_circle(
                        scan.disk_list[i], log=log,
                        need_image=flag_requested or plots_on,
                    )
            except Exception as e:
                # reference surfaces this as a GUI error and asks for manual
                # Y/X + tilt (README.md:110); headless we degrade to an
                # uncorrected geometry + backup bounds and keep going
                print(f"WARNING: ellipse fit failed ({e}); "
                      "proceeding without geometric correction")
                log(f"Ellipse fit FAILED: {e}; no geometric correction")
                options.ratio_fixe = 1.0
                options.slant_fix = 0.0
                if flag_requested:
                    # a requested shift must still yield its products: run
                    # it through the identity-geometry warp path
                    with timer.stage("warp"):
                        frame_circularized, _, _ = correct_image(
                            scan.disk_list[i], 0.0, 1.0,
                            np.array([-1.0, -1.0]), -1.0,
                        )
                else:
                    continue
            else:
                frame_circularized = geo.image
                circle = geo.circle
                borders = geo.borders
                options.ratio_fixe = geo.ratio
                options.slant_fix = math.degrees(geo.phi)
                if (
                    not options.clahe_only
                    and not options.protus_only
                    and not options._nolog
                ):
                    from ..io.writers import submit_figure

                    submit_figure(
                        save_ellipse_fit_plot,
                        output_path(basefich + "_ellipse_fit.png", options),
                        scan.disk_list[i],
                        geo,
                    )
        else:
            ratio = options.ratio_fixe if options.ratio_fixe is not None else 1.0
            phi = (
                math.radians(options.slant_fix)
                if options.slant_fix is not None
                else 0.0
            )
            if flag_requested:
                if i not in batched_warps:
                    batch_warp_pending(i, ratio, phi, log=log if i == 0 else None)
                if i in batched_warps:
                    frame_circularized = batched_warps.pop(i)
                else:
                    with timer.stage("warp"):
                        frame_circularized, _, _ = correct_image(
                            scan.disk_list[i],
                            phi,
                            ratio,
                            np.array([-1.0, -1.0]),
                            -1.0,
                            log=log if i == 0 else None,
                        )
                if options.de_vignette:
                    if circle == NO_CIRCLE:
                        print("WARNING: cannot de-vignette without ellipse fit")
                    else:
                        with timer.stage("de-vignette"):
                            frame_circularized = remove_vignette(
                                frame_circularized, circle
                            )
        if not flag_requested:
            continue

        if sweep_eligible:
            # defer: the whole sweep's transversalium + products run as two
            # vmapped device programs after the loop (see _finish_sweep)
            pending_sweep.append((s, basefich, frame_circularized))
            continue

        with timer.stage("products"):
            # NOTE: stays float after de-vignette, like the reference
            # (removeVignette returns floats; the cast to uint16 happens at
            # the product stage, solex_util.py:528); device arrays pass
            # through without a host round trip
            out = single_image_process(
                frame_circularized,
                scan.header,
                options,
                circle,
                borders,
                basefich,
                scan.backup_bounds,
            )
        results.append((s, out))
        log.complete()

    if pending_sweep:
        with timer.stage("products"):
            results.extend(
                _finish_sweep(pending_sweep, scan, options, circle, borders, log)
            )
    # join the overlapped product-file writes: on return every file exists
    # (and worker errors surface here, attributed to this scan)
    from ..io.writers import barrier as write_barrier

    with timer.stage("products"):
        write_barrier()
    return results


def _finish_sweep(pending, scan, options: Options, circle: Circle, borders, log):
    """Batched post-processing for a Doppler sweep's requested shifts.

    All shifts share the fitted geometry (Solex_recon.py:105-133), so
    per-shift transversalium row stats and the CLAHE/stretch product core
    each run as ONE vmapped device program over the (K, H, W) stack; only
    file writes and tiny gain vectors loop on the host.  Shapes are uniform
    by construction (same warp matrix).  The results are identical to the
    sequential path (test_sweep_batched.py asserts it).
    """
    import jax.numpy as jnp

    from .products import (
        host_products_enabled,
        needed_products,
        products_core_batched,
    )

    if host_products_enabled():
        # host-core sweep: the pending frames are already numpy (native
        # warp) and every consumer below is a host twin — a jnp.stack
        # here would copy the (K, H, W) slab into XLA:CPU buffers only
        # for products_core_batched to pull it straight back out
        stack = np.stack([np.asarray(f) for (_, _, f) in pending])
        if not np.issubdtype(stack.dtype, np.integer):
            stack = np.clip(stack, 0, 65535)
        stack = stack.astype(np.uint16, copy=False)
    else:
        stack = jnp.stack([jnp.asarray(f) for (_, _, f) in pending])
        if not jnp.issubdtype(stack.dtype, jnp.integer):
            stack = jnp.clip(stack, 0, 65535)
        stack = stack.astype(jnp.uint16)

    from ..io.writers import submit as submit_write

    if options.save_fit:
        host_stack = np.asarray(stack)  # one bulk pull for all K writes
        for k, (_, basefich, _) in enumerate(pending):
            submit_write(
                write_fits,
                output_path(basefich + "_circular.fits", options),
                host_stack[k], scan.header,
            )

    if options.transversalium:
        from .transversalium import transversalium_gains_batched

        tr_circle, tr_borders = _transversalium_geometry(
            circle, borders, scan.backup_bounds, stack.shape[2]
        )
        gains = transversalium_gains_batched(
            stack, tr_circle, tr_borders,
            trans_strength=options.trans_strength,
        )
    else:
        gains = None

    # with gains, the row multiply is fused into the product program and its
    # detransversaliumed output comes back as the leading stack; the want
    # gates match image_process's own (needed_products), so a host core
    # never computes a stretch product no shift will save or display
    cores = products_core_batched(stack, gains, want=needed_products(options))
    if gains is not None:
        detrans, cores = cores[0], cores[1:]
        show_plots = (
            not options.clahe_only
            and not options.protus_only
            and not options._nolog
        )
        host_detrans = np.asarray(detrans) if options.save_fit else None
        from ..io.writers import submit_figure

        for k, (_, basefich, _) in enumerate(pending):
            if show_plots:
                submit_figure(
                    save_transversalium_plot,
                    output_path(
                        basefich + "_transversalium_correction.png", options
                    ),
                    gains[k],
                )
            if host_detrans is not None:
                submit_write(
                    write_fits,
                    output_path(basefich + "_detransversaliumed.fits", options),
                    host_detrans[k], scan.header,
                )
    else:
        detrans = stack
    results = []
    for k, (s, basefich, _) in enumerate(pending):
        out = image_process(
            detrans[k], circle, options, scan.header, basefich,
            core_out=tuple(c[k] for c in cores),
        )
        results.append((s, out))
        log.complete()
    return results


def process_file(file: str, options: Options, timer: Optional[StageTimer] = None):
    """Full single-file pipeline (read + process).

    Note: like the reference (Solex_recon.py:49-133), this mutates
    ``options`` (shift bookkeeping, fitted ratio/slant) — callers processing
    multiple files must pass per-file copies (SHG_MAIN.py:129 semantics).
    """
    timer = timer or StageTimer()
    import contextlib

    import jax

    from ..io.writers import barrier as write_barrier

    # a dead device->host direction blocks EVERY device stage at its
    # readback (observed: uploads at 311 MB/s while a 0.25 MB readback
    # hung for minutes), so feed routing alone cannot save the run — the
    # warp/products stages would stall at their downloads.  Pin the whole
    # file to the XLA:CPU backend instead; the canary re-samples after its
    # TTL, so later files ride the accelerator again once the weather
    # clears.  Normally-attached hosts answer the canary in microseconds.
    ctx = contextlib.nullcontext()
    if jax.default_backend() != "cpu" and options.feed_mode in (
        "auto", "host"
    ):
        from ..io.feeder import d2h_responsive

        if not d2h_responsive():
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                print("WARNING: device->host readback unresponsive; "
                      "running this file on the CPU backend")
                ctx = jax.default_device(cpu)

    try:
        with ctx:
            scan = read_scan(file, options, timer)
            return process_scan(scan, options, timer)
    finally:
        # process_scan already joined on success; this covers error paths
        # so a failing scan never leaks queued writes into the next file
        write_barrier()
