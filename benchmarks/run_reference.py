#!/usr/bin/env python3
"""Run the ACTUAL reference (/root/reference/SHG_MAIN.py) end-to-end on a
scan, as the benchmark denominator (VERDICT r3 "What's missing" #1).

The image lacks FreeSimpleGUI/scikit-image/astropy/lsq-ellipse
(requirements.txt); benchmarks/refshims backs exactly the import surface
the reference touches with this repo's validated equivalents (see
refshims/README.md).  Everything else — the Python orchestration, numpy
hot loops (solex_util.py:93-144,174-188), cv2 CLAHE, scipy savgol — is the
reference's own code running unmodified.

Usage: run_reference.py <scan.ser> [flags like -w0c] [--reps N]
Prints one JSON line: {"reference_actual_s": best, "runs_s": [...]}.
"""
import json
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "benchmarks", "refshims")
REF = os.environ.get("SOLEX_REFERENCE_DIR", "/root/reference")


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    if not args:
        raise SystemExit(__doc__)

    # the reference resolves data files relative to itself and writes
    # products next to the input; shims + repo + reference on the path
    sys.path.insert(0, REPO)
    sys.path.insert(0, SHIMS)
    sys.path.insert(0, REF)

    # No jax USE anywhere in this process: the reference forks a Pool
    # (Solex_recon.py:30) and forking a jax runtime with live threads
    # deadlocks; every shim is numpy/scipy-backed for exactly this reason.
    # (This image's axon sitecustomize preloads the jax MODULE into every
    # interpreter — that alone is tolerated; no shim ever runs a jax op.)

    runs = []
    for _ in range(reps):
        sys.argv = [os.path.join(REF, "SHG_MAIN.py")] + list(args)
        t0 = time.perf_counter()
        runpy.run_path(sys.argv[0], run_name="__main__")
        runs.append(round(time.perf_counter() - t0, 3))
    # count products actually written (the reference swallows per-file
    # errors — e.g. it asserts on scans whose 4x-downscaled disk is under
    # ~100 rows, get_flood_image's int(h*0.01) blur — so a "finished" run
    # may have produced nothing; callers must check)
    products = 0
    for a in args:
        base = os.path.splitext(a)[0]
        d = os.path.dirname(os.path.abspath(a)) or "."
        name = os.path.basename(base)
        try:
            products += sum(
                1 for f in os.listdir(d)
                if f.startswith(name) and f.endswith((".png", ".fits")))
        except OSError:
            pass
    print(json.dumps({
        "reference_actual_s": min(runs),
        "runs_s": runs,
        "products_written": products,
        "shimmed": ["FreeSimpleGUI", "skimage", "astropy.io.fits",
                    "ellipse.LsqEllipse"],
    }))


if __name__ == "__main__":
    main()
