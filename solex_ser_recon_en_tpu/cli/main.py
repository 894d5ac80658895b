"""App driver: file batches, config persistence, folder/continuous modes.

reference: SHG_MAIN.py:75-248 — JSON config round-trip (SHG_config.txt),
per-file option copies, openability prechecks, folder glob and
continuous-detect watcher (1-file batches, skip-processed).

Parallel model: the reference overlaps post-processing with the next file's
decode via multiprocessing.Pool(4) (Solex_recon.py:26-44).  Here device
dispatch is already asynchronous (XLA queues work) and the post-processing
is device-side, so a 2-thread pipeline (decode N+1 while N post-processes)
achieves the same overlap without pickling disk images across processes.
"""

from __future__ import annotations

import glob
import os
import sys
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Optional

from ..config import Options
from ..io.video import open_video
from ..pipeline.run import process_scan, read_scan
from ..utils.timer import StageTimer
from .flags import parse_cli, usage  # noqa: F401

CONFIG_NAME = "SHG_config.txt"


def read_ini(path: str = CONFIG_NAME) -> Options:
    try:
        return Options.load(path)
    except Exception:
        print("note: error reading config file - using default parameters")
        return Options()


def write_ini(options: Options, path: str = CONFIG_NAME) -> None:
    try:
        options.save(path)
    except Exception:
        traceback.print_exc()
        print("ERROR: failed to write config file: " + path)


def precheck_files(files: Iterable[str], options: Options) -> List[tuple]:
    """Validate openability; build per-file (file, options-copy) tasks.

    reference: SHG_MAIN.py:98-132.
    """
    files = list(files)
    options.tempo = 30000 if len(files) == 1 else 5000
    good = []
    for f in files:
        if not f or os.path.basename(f) == "":
            print("ERROR filename empty")
            continue
        try:
            with open(f, "rb"):
                pass
        except Exception:
            traceback.print_exc()
            print("ERROR opening file : ", f)
            continue
        good.append((f, options.copy()))
    return good


def is_openable(file: str) -> bool:
    """reference: SHG_MAIN.py:145-152."""
    try:
        return open_video(file).frame_count > 0
    except Exception:
        return False


def handle_files(
    files: Iterable[str], options: Options, flag_command_line: bool = False
) -> int:
    """Process a batch, overlapping decode with post-processing.

    reference: SHG_MAIN.py:134-143 + Solex_recon.py:26-44. Returns the
    number of files fully processed.
    """
    tasks = precheck_files(files, options)
    # a batch worth more bytes than a link probe costs gets one probe up
    # front, so every file (however small) rides the right feed path
    try:
        batch_bytes = sum(os.path.getsize(f) for f, _ in tasks)
        if batch_bytes > 256 * 1024**2:
            from ..io.feeder import probe_transfer_rate

            probe_transfer_rate()
    except OSError:
        pass
    # GUI batches get the reference's progress meter (Solex_recon.py:34-44);
    # headless/CLI runs and single files print instead
    def progress(i: int, msg: str) -> None:
        if flag_command_line or len(tasks) <= 1:
            return
        try:
            from ..gui.main_window import _require_sg

            sg = _require_sg()
            sg.one_line_progress_meter("Progress Bar", i, len(tasks), "", msg)
        except Exception:
            pass

    # device batching: groups of same-shape small SER scans take ONE
    # vmapped mean/max+recon program (pipeline/batch.py) when a responsive
    # accelerator is attached; everything else reads per-file below
    timers: dict = {}
    try:
        from ..pipeline.batch import read_scans_batched

        prebuilt = read_scans_batched(tasks, timers)
    except Exception:
        traceback.print_exc()
        prebuilt = {}

    done = 0
    # decode/process overlap exists to hide DEVICE compute behind the next
    # file's host decode.  A host-pipelined scan on a single-core machine
    # has nothing to hide behind — both stages want the same core, and the
    # GIL ping-pong costs real time (measured 0.89 -> 0.67 s on the 50-file
    # batch corpus) — so those scans run inline instead.  sched_getaffinity
    # (not cpu_count) so a 1-core cgroup on a big machine takes the path.
    try:
        serial_host = len(os.sched_getaffinity(0)) == 1
    except AttributeError:  # non-Linux
        serial_host = (os.cpu_count() or 1) == 1

    def drain(pending: list) -> int:
        n = 0
        for file, fut, timer in pending:
            try:
                fut.result()
                n += 1
                print(f"{file} done:\n{timer.summary()}")
            except Exception:
                print("ERROR ENCOUNTERED")
                traceback.print_exc()
        pending.clear()
        return n

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = []
        for i, (file, opts) in enumerate(tasks):
            print(f"file {file} is processing")
            progress(i, "Reading file...")
            timer = timers.get(file) or StageTimer()
            try:
                scan = prebuilt.get(file) or read_scan(file, opts, timer)
            except Exception:
                print("ERROR ENCOUNTERED")
                traceback.print_exc()
                continue
            if serial_host and scan.host_pipeline:
                # never run concurrently with a pooled scan: process_scan
                # was serialized before this fast path existed, and the
                # global writer pool's end-of-scan barrier would otherwise
                # drain (and misattribute) the other scan's queued writes
                done += drain(pending)
                try:
                    process_scan(scan, opts, timer)
                    done += 1
                    print(f"{file} done:\n{timer.summary()}")
                except Exception:
                    print("ERROR ENCOUNTERED")
                    traceback.print_exc()
                continue
            pending.append((file, pool.submit(process_scan, scan, opts, timer), timer))
        done += drain(pending)
    # deferred diagnostic-figure lane: renders overlapped the batch; join
    # here so every file exists when the command finishes (io/writers.py)
    from ..io.writers import figure_barrier

    try:
        figure_barrier()
    except Exception:
        print("ERROR ENCOUNTERED")
        traceback.print_exc()
    progress(len(tasks), "Done.")
    return done


def folder_scan_files(input_dir: str) -> List[str]:
    """All SER/AVI scans in a folder (the single source of the glob —
    shared with parallel.distributed.shard_folder_batch).

    reference: SHG_MAIN.py:156,192.
    """
    return glob.glob(os.path.join(input_dir, "*.ser")) + glob.glob(
        os.path.join(input_dir, "*.avi")
    )


def handle_folder(options: Options, poll_seconds: float = 1.0,
                  stop_after: Optional[float] = None) -> int:
    """Folder batch / continuous-detect mode.

    reference: SHG_MAIN.py:154-208 — non-continuous processes the current
    glob; continuous polls for new files, batch size 1, skipping processed/
    unreadable files, until stopped (here: stop_after seconds, None = run
    until KeyboardInterrupt).  Returns files processed.
    """
    def todo() -> List[str]:
        files = sorted(folder_scan_files(options.input_dir))
        if options.num_processes > 1:
            # multi-host DCN split: every process computes the same
            # deterministic hash split locally, no coordinator
            # (parallel/distributed.assign_files) — the host-scale
            # analogue of the reference's Pool(4), Solex_recon.py:30
            from ..parallel.distributed import assign_files

            files = assign_files(files, options.num_processes,
                                 options.process_id)
        return files

    if not options.continuous_detect_mode:
        files = todo()
        print(f"number of files todo: {len(files)}")
        return handle_files(files, options)

    processed = set()
    count = 0
    start = time.monotonic()
    try:
        while stop_after is None or time.monotonic() - start < stop_after:
            batch = [
                f
                for f in todo()
                if f not in processed and os.access(f, os.R_OK) and is_openable(f)
            ][:1]
            if batch:
                count += handle_files(batch, options, True)
                processed.update(batch)
            else:
                time.sleep(poll_seconds)
    except KeyboardInterrupt:
        print("continuous mode stopped")
    return count


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # framework extension: --profile[=dir] wraps the run in a jax.profiler
    # trace (the reference's only hook is a dead cProfile branch,
    # SHG_MAIN.py:225-228)
    profile_dir = None
    rest = []
    for a in argv:
        if a == "--profile":
            profile_dir = "/tmp/solex_profile"
        elif a.startswith("--profile="):
            profile_dir = a.split("=", 1)[1]
        else:
            rest.append(a)
    options = Options()
    files = parse_cli(options, rest)

    # on relay-attached hosts a dead tunnel hangs the first device use
    # forever; probe (bounded) and fall back to the CPU backend instead
    from ..utils.backend import ensure_responsive_backend, relay_attached

    if relay_attached():
        ensure_responsive_backend()

    def run() -> int:
        if not files:
            if options.input_dir:
                return 0 if handle_folder(options) > 0 else 1
            print(usage())
            return 1
        options.validate()
        n = handle_files(files, options, flag_command_line=True)
        return 0 if n == len(files) else 1

    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            rc = run()
        print(f"profiler trace written to {profile_dir}")
        return rc
    return run()


if __name__ == "__main__":
    rc = main()
    # hard-exit with the real rc: on a half-dead relay the axon plugin's
    # C++ teardown can abort the interpreter (exit 134) AFTER a fully
    # successful run, breaking callers that check the exit status.  All
    # outputs are already durable here (writer pools are joined inside
    # handle_files, the profiler trace is written before main returns).
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(rc)
