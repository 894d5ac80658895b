"""Overlapped product-file writer pool.

The product stage's wall time on slow hosts is dominated by nine
independent file writes (five FITS, four PNGs) plus three matplotlib
diagnostic plots, each a serial download + encode + disk write
(measured ~3-4 s of the warm all-products config).  The writes have no
ordering dependencies, and their cost mixes blocking IO (device->host
pulls over the relay, page-cache flushes) with CPU encode — two worker
threads overlap one write's IO with another's encode.

The pipeline submits writes as it produces images and joins at the end
of ``process_scan`` / ``process_file`` (pipeline/run.py), so the
function-return contract — "all product files exist on return" — is
unchanged and benchmarks measure true completion.  Worker exceptions are
re-raised at the barrier.  SOLEX_SYNC_WRITES=1 restores strictly
sequential writes (debugging / timing attribution).

reference note: the reference writes synchronously inline
(solex_util.py:556-587, Solex_recon.py:80-152); overlapping them is a
framework improvement with identical file contents.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor

_lock = threading.Lock()
_pool: ThreadPoolExecutor | None = None
_pending: list = []


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="solex-write"
        )
    return _pool


def submit(fn, *args, **kwargs) -> None:
    """Queue one product-file write (or run it inline under
    SOLEX_SYNC_WRITES=1)."""
    if os.environ.get("SOLEX_SYNC_WRITES") == "1":
        fn(*args, **kwargs)
        return
    with _lock:
        fut = _get_pool().submit(fn, *args, **kwargs)
        _pending.append(fut)


def barrier() -> None:
    """Wait for every queued write; re-raise the first worker error."""
    with _lock:
        pending = _pending[:]
        _pending.clear()
    first_err = None
    for f in pending:
        try:
            f.result()
        except Exception as e:  # noqa: BLE001 — surface after draining all
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err
