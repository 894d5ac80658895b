"""Continuous-detect processing window (FreeSimpleGUI, gated).

reference: SHG_MAIN.py:154-208 — the "Continuous processing mode" window:
polls the input folder for new SER/AVI files (batch size 1, skipping
processed/unreadable/unopenable ones), processes each through the full
pipeline, and shows a live 600x600 preview of the last CLAHE product with
running counters and a Stop button.

This implementation keeps the reference's observable behaviour (poll →
process → preview/counters → Stop) as a thin view over the same watcher
logic the headless `cli.main.handle_folder` uses, reading the window with a
timeout instead of reproducing the reference's perform_long_operation event
plumbing.  The black placeholder frame is generated (the reference ships a
`Black.png` asset, SHG_MAIN.py:165).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from ..config import Options, output_path
from ..io.png import png_bytes, read_image
from .main_window import _require_sg

PREVIEW = (600, 600)


def _black_png() -> bytes:
    import numpy as np

    return png_bytes(np.zeros(PREVIEW, dtype=np.uint8))


def _preview_png(path: str, maxsize=PREVIEW) -> bytes:
    """Downscaled 8-bit PNG bytes of a product image for sg.Image.

    reference: UI_handler.get_img_data (PIL thumbnail -> PhotoImage); here
    the preview bytes feed sg.Image(data=...) directly.
    """
    import numpy as np

    img = read_image(path)
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    h, w = img.shape[:2]
    scale = min(maxsize[0] / h, maxsize[1] / w, 1.0)
    if scale < 1.0:
        try:
            import cv2

            img = cv2.resize(img, (max(1, int(w * scale)), max(1, int(h * scale))))
        except Exception:
            step = max(1, int(round(1.0 / scale)))
            img = img[::step, ::step]
    return png_bytes(img)


def continuous_ui(
    options: Options,
    poll_seconds: float = 1.0,
    stop_after: Optional[float] = None,
) -> int:
    """Run the continuous-detect window; returns files processed.

    ``stop_after`` bounds the wall-clock for headless/driver use (the
    reference runs until Stop / window close).
    """
    sg = _require_sg()
    from ..cli.main import folder_scan_files, handle_files, is_openable

    layout = [
        [
            sg.Text("Auto processing of SHG video files", font="Any 12",
                    key="Auto processing of SHG video files"),
            sg.Push(),
            sg.Button("Stop"),
        ],
        [
            sg.Text("Number of files processed: 0", key="auto_info"),
            sg.Push(),
            sg.Text("Looking for files ...", key="status_info"),
        ],
        [sg.Image(data=_black_png(), size=PREVIEW, key="_prev_img")],
        [sg.Text("Last: none", key="last")],
    ]
    window = sg.Window("Continuous processing mode", layout, keep_on_top=True)
    window.finalize()

    processed = set()
    count = 0
    start = time.monotonic()
    timeout_ms = max(1, int(poll_seconds * 1000))
    try:
        while stop_after is None or time.monotonic() - start < stop_after:
            event, _ = window.read(timeout=timeout_ms)
            if event == sg.WIN_CLOSED or event == "Stop":
                break
            batch = [
                f
                for f in folder_scan_files(options.input_dir)
                if f not in processed
                and os.access(f, os.R_OK)
                and is_openable(f)
            ][:1]
            if not batch:
                window["status_info"].update("Looking for files ...")
                continue
            window["status_info"].update(f"About to process {len(batch)} file")
            count += handle_files(batch, options, True)
            processed.update(batch)
            window["auto_info"].update(
                f"Number of files processed: {len(processed)}"
            )
            prev = output_path(
                os.path.splitext(batch[-1])[0]
                + f"_shift={options.shift[-1]}_clahe.png",
                options,
            )
            if os.path.exists(prev):
                window["_prev_img"].update(data=_preview_png(prev))
                window["last"].update("Last: " + prev)
            window["status_info"].update("Looking for files ...")
    finally:
        window.close()
    return count
