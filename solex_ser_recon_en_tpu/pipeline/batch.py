"""Folder-batch device batching: N same-shape small scans, ONE device
program for the data plane.

The reference's batch model is a per-file process Pool
(Solex_recon.py:26-44): every scan pays its own pass A, recon dispatch and
product program.  On a TPU the per-dispatch latency and the tiny per-file
tensors leave the chip idle; grouping B same-shape scans into a
(B, F, ih, iw) slab and running the recon as one vmapped program
(parallel/mesh.py:device_recon_batch, sharded ('batch', 'frame') under a
mesh) amortises all of it.  The control plane (line fit per file, ellipse
fit, transversalium) stays per-file host code operating on the batched
outputs — identical results to the per-file path by construction (the
recon kernel and mean/max math are the same programs read_scan dispatches).

Engaged from cli.main.handle_files when:
  - an accelerator backend is attached AND its D2H readback is responsive
    (a dead downlink would hang the disk pull; the per-file host path
    handles that weather),
  - >= SOLEX_BATCH_MIN_FILES (default 3) scans share (frames, ih, iw),
  - every scan is small (<= SOLEX_BATCH_MAX_MB, default 64 — big scans
    already fill the chip solo and stream through the chunked feeds),
  - options don't require the full mean image as a product (save_fit).
Anything not grouped falls back to the per-file read_scan path.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Options, output_path
from ..utils.log import RunLog
from ..utils.timer import StageTimer


def _batchable(options: Options) -> bool:
    if options.save_fit:
        return False  # _mean.fits wants read_scan's exact mean product path
    if os.environ.get("SOLEX_NO_DEVICE_BATCH") == "1":
        return False
    import jax

    if jax.default_backend() == "cpu" and options.mesh is None:
        # no accelerator: the per-file host pass is strictly faster than
        # staging slabs into XLA:CPU buffers (a mesh request keeps the
        # batched path: virtual meshes exist to exercise it)
        return False
    from ..io.feeder import d2h_responsive

    return d2h_responsive()


def _group_key(path: str):
    """(frames, ih, iw) of a scan, or None when unreadable.

    SER headers are parsed directly (cheap); AVI goes through open_video
    (cv2 metadata only — frames are not decoded here)."""
    try:
        if path.lower().endswith(".ser"):
            from ..io.ser import SerReader

            r = SerReader(path)
            return (r.frame_count, r.ih, r.iw)
        from ..io.video import open_video

        v = open_video(path)
        return (v.frame_count, v.ih, v.iw)
    except Exception:
        return None


def read_scans_batched(
    tasks: List[Tuple[str, Options]],
    timers: Dict[str, StageTimer],
) -> Dict[str, "object"]:
    """Batched read+recon for the same-shape SER groups within ``tasks``.

    Returns {file: ScanResult} for every file it handled; callers run the
    remaining files through the per-file read_scan.  Never raises: a bad
    file is skipped, a bad GROUP falls back whole to the per-file reader.
    """
    if not tasks or not _batchable(tasks[0][1]):
        return {}
    try:
        min_files = int(os.environ.get("SOLEX_BATCH_MIN_FILES", "3"))
        max_bytes = int(
            float(os.environ.get("SOLEX_BATCH_MAX_MB", "64")) * 1024**2)
    except ValueError:
        min_files, max_bytes = 3, 64 * 1024**2

    groups: Dict[tuple, List[Tuple[str, Options]]] = {}
    for file, opts in tasks:
        if not file.lower().endswith((".ser", ".avi")):
            continue
        try:
            if os.path.getsize(file) > max_bytes:
                continue
        except OSError:
            continue
        key = _group_key(file)
        if key is not None:
            groups.setdefault(key, []).append((file, opts))

    out: Dict[str, object] = {}
    for key, members in groups.items():
        if len(members) < min_files:
            continue
        try:
            _process_group(key, members, min_files, timers, out)
        except Exception:
            # one bad group must not cost the other groups their batched
            # work — its members fall back to the per-file reader
            import traceback

            traceback.print_exc()
    return out


def _process_group(key, members, min_files, timers, out) -> None:
    from ..geometry.linefit import fit_spectral_line
    from ..io.fits import make_header
    from ..io.hostreduce import host_mean_max_frames
    from ..io.video import open_video
    from ..ops.recon import build_shift_indices
    from ..parallel.mesh import device_recon_batch, mesh_from_options
    from .run import ScanResult

    frames_list, fits, metas = [], [], []
    for file, opts in members:
        try:
            timer = timers.setdefault(file, StageTimer())
            basefich0 = os.path.splitext(file)[0]
            opts.basefich0 = basefich0
            log = RunLog(basefich0, opts)
            log.clear()
            log("Pixel shift : " + str(opts.shift))
            requested = list(opts.shift)
            opts.shift_requested = requested
            shifts = list(dict.fromkeys(
                [opts.ellipse_fit_shift, 0] + requested))
            with timer.stage("open"):
                vid = open_video(file)
            log(f"Width, Height : {vid.Width} {vid.Height}")
            log(f"Number of frames : {vid.frame_count}")
            with timer.stage("mean/max"):
                frames = np.asarray(vid.read_all())
                mean_img, max_img = host_mean_max_frames(frames)
            with timer.stage("line fit"):
                lf = fit_spectral_line(mean_img, max_img)
            log(f"Vertical limits y1, y2 : {lf.y1} {lf.y2}")
            log("Spectral line polynomial fit: " + str(lf.poly))
            frames_list.append(frames)
            fits.append(lf)
            metas.append((file, opts, shifts, requested, mean_img,
                          make_header(vid.iw, vid.ih), basefich0, log))
        except Exception:
            import traceback

            traceback.print_exc()
    if len(frames_list) < min_files:
        return

    # shift lists can differ per file only via options copies — the
    # batch driver hands out copies of ONE options object, so S aligns;
    # a mismatched straggler falls back to the per-file path
    S = len(metas[0][2])
    aligned = [i for i in range(len(metas)) if len(metas[i][2]) == S]
    if len(aligned) < min_files:
        return
    iw = key[2]
    ind_all, w_all = [], []
    for i in aligned:
        lf = fits[i]
        ind_l, left_w = build_shift_indices(
            lf.floor, lf.frac, metas[i][2], iw)
        ind_all.append(ind_l)
        w_all.append(left_w)

    # cap the slab: B is chunked so one device call never stages more
    # than ~SOLEX_BATCH_SLAB_MB of frames (a 300-file folder of 64 MB
    # scans must not np.stack 19 GB); chunks still amortise dispatch
    try:
        slab_bytes = int(float(os.environ.get(
            "SOLEX_BATCH_SLAB_MB", "512")) * 1024**2)
    except ValueError:
        slab_bytes = 512 * 1024**2
    per_file = max(1, frames_list[aligned[0]].nbytes)
    chunk_b = max(min_files, slab_bytes // per_file)

    import jax

    mesh = mesh_from_options(members[0][1].mesh)
    stamp = timers[metas[aligned[0]][0]]
    raw_parts = []
    with stamp.stage("recon"):
        for c0 in range(0, len(aligned), chunk_b):
            sel = range(c0, min(c0 + chunk_b, len(aligned)))
            raw = device_recon_batch(
                np.stack([frames_list[aligned[k]] for k in sel]),
                np.stack([ind_all[k] for k in sel]),
                np.stack([w_all[k] for k in sel]),
                mesh=mesh)
            raw_parts.append(jax.block_until_ready(raw))

    for slot, i in enumerate(aligned):
        file, opts, shifts, requested, mean_img, hdr, basefich0, log = \
            metas[i]
        lf = fits[i]
        disks = raw_parts[slot // chunk_b][slot % chunk_b]
        if opts.flip_x:  # mirror like read_scan (run.py flip_x branch)
            disks = disks[:, :, ::-1]
        hdr["NAXIS1"] = disks.shape[2]  # recon width (reference :65)
        plot_wanted = (not opts.clahe_only and not opts.protus_only
                       and not opts._nolog)
        if plot_wanted:
            from ..io.writers import submit_figure
            from .plots import save_spectral_line_plot

            submit_figure(
                save_spectral_line_plot,
                output_path(basefich0 + "_spectral_line_data.png", opts),
                mean_img, lf,
            )
        out[file] = ScanResult(
            disk_list=disks,
            shifts=shifts,
            shift_requested=requested,
            backup_bounds=(lf.y1, lf.y2),
            header=hdr,
            basefich0=basefich0,
            mean_img=mean_img,
            linefit=lf,
            small_ops_host=False,
            host_pipeline=False,
        )

