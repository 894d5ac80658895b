"""Multi-host scale-out (the DCN layer).

The reference's only scale-out is a 4-process pool on one machine
(Solex_recon.py:30-42).  The TPU-native equivalent splits work at two
levels (SURVEY.md §5.8):

- across hosts (DCN): different *files* to different processes — scans are
  independent, so this is pure data parallelism with no communication;
- within a host's chips (ICI): the ('batch', 'frame') mesh of
  parallel/mesh.py.

``initialize`` wires jax.distributed for a multi-process run;
``assign_files`` is the deterministic work-split every process computes
locally (no coordinator needed).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize passthrough (env-based when args omitted)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def assign_files(
    files: Sequence[str], num_processes: int, process_id: int
) -> List[str]:
    """Deterministic split of a file batch across processes.

    Stable content-independent hashing (not round-robin) so membership is
    insensitive to listing order AND to later additions — the property the
    continuous-detect watcher needs when hosts poll a shared directory.
    Only the basename is hashed, so hosts mounting the same share at
    different paths agree on the split.  Balance is statistical (uniform in
    expectation); small batches can be uneven.
    """
    if not 0 <= process_id < num_processes:
        raise ValueError("process_id out of range")
    import os

    mine = []
    for f in files:
        key = os.path.basename(f)
        h = int.from_bytes(hashlib.sha1(key.encode()).digest()[:4], "big")
        if h % num_processes == process_id:
            mine.append(f)
    return mine


def shard_folder_batch(options, num_processes: int, process_id: int):
    """Folder-batch worklist for this process (cli.main.handle_folder's
    multi-host form)."""
    from ..cli.main import folder_scan_files

    return assign_files(
        sorted(folder_scan_files(options.input_dir)), num_processes, process_id
    )
