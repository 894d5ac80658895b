#!/usr/bin/env python3
"""Headless screenshot of the real main GUI window.

Runs the framework's actual tkinter main window (gui/main_window.py via the
in-repo FreeSimpleGUI-compatible backend gui/fsg_tk.py) against the in-repo
MicroX display server (gui/microx.py) and saves the rendered framebuffer —
no X server, no display hardware, no third-party GUI package.

The display server runs IN this process (so its framebuffer is readable);
the Tk client must therefore be a subprocess (``MicroXServer.spawn``
documents the GIL deadlock the other way around).

Usage: python examples/gui_screenshot.py [out.png] [main|analyser]

``analyser`` runs a real analysis session (synthetic scan -> Start
analysis -> Auto dispersion) in the spectral-analyser window, with its
embedded matplotlib canvas, before the snapshot.
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CLIENT_MAIN = """
import jax
jax.config.update("jax_platforms", "cpu")   # never dial an accelerator here
from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.gui import main_window
from solex_ser_recon_en_tpu.gui.main_window import _require_sg

sg = _require_sg()
orig_window = sg.Window

class Hold(orig_window):
    def read(self, *a, **k):
        orig_window.read(self, timeout=200)
        print("MAPPED", flush=True)
        for _ in range(200):                 # hold ~20 s for the snapshot
            orig_window.read(self, timeout=100)
        return sg.WIN_CLOSED, None

sg.Window = Hold
main_window.input_ui(Options())
"""

_CLIENT_ANALYSER = """
import os, tempfile
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from solex_ser_recon_en_tpu.analyser.atlas import anchor_table
from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.gui import analyser_window
from solex_ser_recon_en_tpu.gui.main_window import _require_sg
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

scan_path = os.path.join(tempfile.mkdtemp(), "scan.ser")
SyntheticScan(ih=220, iw=120, frames=180, depth=16,
              line_poly=(60.0, 0.0, 0.0, 0.0), disk_radius=70.0,
              noise=0.002, seed=9).write(scan_path)
sg = _require_sg()
a_waves, a_names, anchors = anchor_table()
halpha = anchors[int(np.argmin(np.abs(np.asarray(a_waves) - 6562.808)))]
script = [("Start analysis", {"-FILE2-": scan_path}),
          ("Auto dispersion", {"-anchor-": halpha})]
orig_window = sg.Window

class Scripted(orig_window):
    def read(self, *a, **k):
        ev, vals = orig_window.read(self, timeout=100)
        if script:
            event, over = script.pop(0)
            return event, dict(vals or {}, **over)
        print("MAPPED", flush=True)
        for _ in range(200):
            orig_window.read(self, timeout=100)
        return sg.WIN_CLOSED, None

sg.Window = Scripted
analyser_window.analyse_spectrum(Options(), scan_path)
"""


def main(out_path: str = "demo_out/gui_main_window.png",
         which: str = "main") -> int:
    # a GUI screenshot needs no accelerator; force the CPU backend BEFORE
    # the package import can initialise a device (the accelerator site
    # hook overrides the JAX_PLATFORMS env var, so use the config API)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from solex_ser_recon_en_tpu.gui.microx import MicroXServer

    xs = MicroXServer().start()
    try:
        with tempfile.NamedTemporaryFile(
                "w", suffix=".py", delete=False) as f:
            f.write(_CLIENT_ANALYSER if which == "analyser"
                    else _CLIENT_MAIN)
            client = f.name
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, DISPLAY=xs.display, JAX_PLATFORMS="cpu",
                   PYTHONPATH=repo + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        p = subprocess.Popen([sys.executable, client], env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        try:
            from solex_ser_recon_en_tpu.gui.microx import wait_for_line

            if not wait_for_line(p, "MAPPED", timeout_s=120):
                print("client failed or never mapped")
                return 1
            time.sleep(3)                     # let Tk finish painting
            snap = xs.snapshot()
            if snap is None:
                print("no framebuffer rendered")
                return 1
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            try:
                from PIL import Image

                Image.fromarray(snap).save(out_path)
            except ImportError:
                from solex_ser_recon_en_tpu.io.png import write_png

                write_png(out_path, snap)
            print(f"saved {out_path} ({snap.shape[1]}x{snap.shape[0]})")
            return 0
        finally:
            p.terminate()
            os.unlink(client)
    finally:
        xs.stop()


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
