"""Standalone CLAHE application over saved images.

reference: clahe_apply.py — a separate tool that applies
cv2-semantics CLAHE (clipLimit=0.8, tile size 1-4) to PNG/TIF images with
an optional low/high percentile stretch (saturation alpha), persisting its
own JSON config (clahe_config.txt, keys workDir/language/lo/hi/do_stretch/
sat/tile_size).

    python -m solex_ser_recon_en_tpu.cli.clahe_tool img1.png img2.tif \
        [--tile 2] [--stretch --lo 0 --hi 100 --sat 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback
from typing import List, Optional

import numpy as np

from ..io.png import read_image, write_png
from ..ops.clahe import clahe
from ..ops.stretch import rescale_brightness

CONFIG_NAME = "clahe_config.txt"
DEFAULTS = {
    "workDir": "",
    "language": "English",
    "lo": 0,
    "hi": 100,
    "do_stretch": False,
    "sat": 80,
    "tile_size": 2,
}


def read_ini(path: str = CONFIG_NAME) -> dict:
    options = dict(DEFAULTS)
    try:
        with open(path, encoding="utf-8") as fp:
            options.update(json.load(fp))
    except Exception:
        pass
    return options


def write_ini(options: dict, path: str = CONFIG_NAME) -> None:
    try:
        with open(path, "w", encoding="utf-8") as fp:
            json.dump(options, fp, sort_keys=True, indent=4)
    except Exception:
        traceback.print_exc()


def apply_clahe(file: str, options: dict, write_file: bool = True) -> np.ndarray:
    """reference: clahe_apply.py:243-256."""
    import jax

    from ..io.feeder import d2h_responsive
    from ..utils.placement import set_small_ops_on_host, small_ops

    # half-dead relay (discovery answers, downloads stall): both ops below
    # end in a readback, so route them to XLA:CPU per the same canary the
    # pipeline uses (memoised; a fully dead tunnel is already handled by
    # ensure_responsive_backend in main)
    if jax.default_backend() != "cpu" and not d2h_responsive():
        set_small_ops_on_host(True)
    frame = read_image(file)
    if frame.dtype not in (np.uint8, np.uint16):
        frame = np.clip(frame, 0, 65535).astype(np.uint16)
    t = int(options["tile_size"])
    with small_ops():
        cl1 = np.asarray(clahe(frame, clip_limit=0.8, tiles=(t, t)))
        if options["do_stretch"]:
            dark = np.percentile(frame, options["lo"])
            bright = np.percentile(frame, options["hi"])
            cl1 = np.asarray(
                rescale_brightness(cl1, dark, bright, alpha=options["sat"] / 100)
            )
    if write_file:
        out = os.path.splitext(file)[0] + "_clahe.png"
        write_png(out, cl1)
        print("save:", out)
    return cl1


def main(argv: Optional[List[str]] = None) -> int:
    # relay-attached hosts: a dead tunnel hangs the first device use;
    # probe (bounded) and fall back to the CPU backend instead
    from ..utils.backend import ensure_responsive_backend, relay_attached

    if relay_attached():
        ensure_responsive_backend()
    ap = argparse.ArgumentParser(description="Apply CLAHE to images")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--tile", type=int, default=None, choices=range(1, 5))
    ap.add_argument("--stretch", action="store_true")
    ap.add_argument("--lo", type=int, default=None)
    ap.add_argument("--hi", type=int, default=None)
    ap.add_argument("--sat", type=int, default=None)
    args = ap.parse_args(argv)

    options = read_ini()
    if args.tile is not None:
        options["tile_size"] = args.tile
    if args.stretch:
        options["do_stretch"] = True
    for k in ("lo", "hi", "sat"):
        v = getattr(args, k)
        if v is not None:
            options[k] = v
    if options["do_stretch"] and options["hi"] <= options["lo"]:
        print("Error: the low percentile must be less than the high percentile!")
        return 1
    for f in args.files:
        apply_clahe(f, options)
    options["workDir"] = os.path.dirname(args.files[0])
    write_ini(options)
    return 0


if __name__ == "__main__":
    sys.exit(main())
