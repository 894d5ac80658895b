#!/usr/bin/env python3
"""Self-contained demo: synthesise a Sol'Ex scan, run the full pipeline.

    python examples/demo.py [out_dir]

Generates a 480-frame synthetic spectroheliograph scan (known line curvature,
disk squash, tilt, transversalium striping), reconstructs it through the
full TPU pipeline, and prints where every product landed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.pipeline.run import process_file
from solex_ser_recon_en_tpu.utils.timer import StageTimer


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "demo_out"
    os.makedirs(out, exist_ok=True)
    scan_path = os.path.join(out, "demo.ser")

    print("synthesising scan (512x96 px, 480 frames, 16-bit)...")
    scan = SyntheticScan(
        ih=512, iw=96, frames=480, depth=16,
        line_poly=(48.0, 0.01, -5e-5, 1e-7),
        squash_y=1.12, shear=0.05, disk_radius=150.0,
        trans_stripes=0.12, noise=0.002, seed=21,
    )
    scan.write(scan_path, transpose_to_wide=True)

    opts = Options(shift=[0], save_fit=True, output_dir=out)
    timer = StageTimer()
    t0 = time.perf_counter()
    process_file(scan_path, opts, timer)
    print(f"\npipeline finished in {time.perf_counter() - t0:.1f}s")
    print(timer.summary())
    print(f"\nfitted Y/X ratio {opts.ratio_fixe:.3f} (injected 1.12+shear), "
          f"tilt {opts.slant_fix:.2f} deg")
    print("\nproducts:")
    for f in sorted(os.listdir(out)):
        if f.startswith("demo_") and f != "demo.ser":
            print("  ", os.path.join(out, f))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
