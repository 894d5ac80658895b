"""Standalone CLAHE tool window (FreeSimpleGUI, gated).

reference: clahe_apply.py:113-240 (inputUI + event loop) — file picker,
tile-size slider (1-4), optional low/high percentile stretch with
saturation, language combo, own ``clahe_config.txt`` persistence.  All
numerics come from the tested CLI core (cli/clahe_tool.py); this module is
only the event loop.  Headless installs use
``python -m solex_ser_recon_en_tpu.cli.clahe_tool``.
"""

from __future__ import annotations

import traceback
from typing import Optional

from ..i18n import read_langs, tr
from ..cli.clahe_tool import CONFIG_NAME, apply_clahe, read_ini, write_ini


def input_ui(options: dict):
    """Show the CLAHE window; mutates ``options``; returns the selected
    files (None = quit).  reference: clahe_apply.py:113-211."""
    from .main_window import _require_sg

    sg = _require_sg()

    langs, lang_dicts = read_langs()
    lang = (
        lang_dicts[langs.index(options["language"])]
        if options["language"] in langs
        else {}
    )

    def T(key: str) -> str:
        return tr(lang, key)

    layout = [
        [sg.Text("Apply CLAHE to images", font="Any 14", key="Apply CLAHE"),
         sg.Push(),
         sg.Combo(langs, key="lang_input", enable_events=True,
                  default_value=options["language"], readonly=True)],
        [sg.Text(T("File(s)"), key="File(s)"),
         sg.InputText(default_text=options["workDir"], size=(70, 1), key="-FILE-"),
         sg.FilesBrowse("Open", key="Open",
                        file_types=(("Image files", "*.png *.tif"),))],
        [sg.Text("Tile size:", key="Tile size"),
         sg.Slider(range=(1, 4), default_value=options["tile_size"],
                   resolution=1, orientation="horizontal", key="tile_size")],
        [sg.Checkbox("Use high/low stretch", default=options["do_stretch"],
                     key="do_stretch", enable_events=True)],
        [sg.Text("Low threshold:", key="Low threshold"),
         sg.Slider(range=(0, 100), default_value=options["lo"], resolution=1,
                   orientation="horizontal", key="lo")],
        [sg.Text("High threshold:", key="High threshold"),
         sg.Slider(range=(0, 100), default_value=options["hi"], resolution=1,
                   orientation="horizontal", key="hi")],
        [sg.Text("Saturation percentage:", key="Saturation percentage"),
         sg.Slider(range=(50, 100), default_value=options["sat"], resolution=1,
                   orientation="horizontal", key="sat")],
        [sg.Button(T("OK"), key="OK"), sg.Cancel(T("Cancel"), key="Cancel")],
    ]
    window = sg.Window("CLAHE (TPU)", layout, finalize=True)
    try:
        while True:
            event, values = window.read()
            if event in (sg.WIN_CLOSED, "Cancel"):
                return None
            if event == "lang_input":
                options["language"] = values["lang_input"]
                lang = lang_dicts[langs.index(options["language"])]
                for k, val in lang.items():
                    if k in window.AllKeysDict and not k.startswith("_"):
                        try:
                            window[k].update(text=val)
                        except Exception:
                            try:
                                window[k].update(val)
                            except Exception:
                                pass
            if event == "OK":
                files = [f for f in str(values["-FILE-"]).split(";") if f]
                if not files:
                    sg.popup_ok(tr(lang, "no_file_error"))
                    continue
                lo, hi = int(values["lo"]), int(values["hi"])
                if values["do_stretch"] and hi <= lo:
                    # reference: hi_less_than_lo_error popup
                    sg.popup_ok(
                        "Error: the low percentile must be less than the "
                        "high percentile!"
                    )
                    continue
                options.update(
                    lo=lo, hi=hi, sat=int(values["sat"]),
                    do_stretch=bool(values["do_stretch"]),
                    tile_size=int(values["tile_size"]),
                )
                return files
    finally:
        window.close()


def run_app() -> int:
    """Config round-trip + per-file CLAHE loop (clahe_apply.py:260-267)."""
    from .main_window import _require_sg

    sg = _require_sg()
    import os

    options = read_ini(CONFIG_NAME)
    while True:
        files = input_ui(options)
        if files is None:
            break
        options["workDir"] = os.path.dirname(files[0])
        write_ini(options)
        for f in files:
            try:
                apply_clahe(f, options)
            except Exception:
                traceback.print_exc()
                sg.popup_ok("ERROR: " + traceback.format_exc())
    write_ini(options)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(run_app())
