"""Main application window (FreeSimpleGUI, gated).

reference: UI_handler.py:169-311 (inputUI) + SHG_MAIN.py:229-246 (event
loop).  This module reproduces the reference window — File/Folder tabs, all
option widgets, language hot-swap, the spectral-analyser launch button —
on top of the tested form layer (gui/form.py) and pipeline.  It imports
FreeSimpleGUI lazily so headless installs never touch it; install
FreeSimpleGUI to use the GUI (``pip install FreeSimpleGUI``).
"""

from __future__ import annotations

import os
import sys
import traceback
from typing import List, Optional

from ..config import Options
from ..i18n import read_langs, tr
from .form import default_form_values, interpret_form_values


def _require_sg():
    """The GUI toolkit: an installed FreeSimpleGUI if present, else the
    in-repo tkinter backend (gui/fsg_tk.py) — the windows speak the same
    API either way, so plain Python-with-Tk runs the GUI dependency-free."""
    try:
        import FreeSimpleGUI as sg  # type: ignore

        return sg
    except Exception:
        pass
    try:
        import tkinter  # noqa: F401  # pragma: no cover - headless env

        from . import fsg_tk

        return fsg_tk
    except Exception as e:  # pragma: no cover - headless env
        raise RuntimeError(
            "The GUI needs a toolkit: either install FreeSimpleGUI "
            "(pip install FreeSimpleGUI) or use a Python built with "
            "tkinter (the bundled gui.fsg_tk backend needs only that); "
            "use the CLI front end (python -m solex_ser_recon_en_tpu.cli) "
            "in headless environments."
        ) from e


def input_ui(options: Options) -> Optional[List[str]]:
    """Show the main window; returns selected files (None = quit).

    reference: UI_handler.py:169-311.
    """
    sg = _require_sg()
    langs, lang_dicts = read_langs()
    lang = lang_dicts[langs.index(options.language)] if options.language in langs else {}
    v = default_form_values(options)
    # localized popup texts (reference: UI_handler.py:171,143-144)
    popup_messages = {
        "no_file_error": "Error: file not entered! Please enter file(s)",
        "no_folder_error": "Error: folder not entered! Please enter folder",
    }
    for k in popup_messages:
        if k in lang:
            popup_messages[k] = lang[k]

    def T(key: str) -> str:
        return tr(lang, key)

    def _flag_data(d) -> bytes:
        """PNG bytes of a language's flag icon (reference: get_img_data
        over language_data/flag*.png, UI_handler.py:139-141)."""
        from ..i18n import language_dirs

        name = d.get("_flag_icon", "flagEN.png") if d else "flagEN.png"
        for dirpath in language_dirs():
            p = os.path.join(dirpath, name)
            if os.path.exists(p):
                try:
                    with open(p, "rb") as f:
                        return f.read()
                except OSError:
                    pass
        return b""

    file_tab = [
        [sg.Text(T("File(s)"), key="File(s)"),
         sg.InputText(default_text=options.workDir, size=(65, 1), key="-FILE-"),
         sg.FilesBrowse(T("Choose file(s)"), key="Choose file(s)",
                        file_types=(("Video Files (SER, AVI)", "*.ser *.avi"),))],
    ]
    folder_tab = [
        [sg.Text(T("Folder"), key="Folder"),
         sg.InputText(default_text=options.input_dir, size=(65, 1), key="input_dir"),
         sg.FolderBrowse(T("Choose input folder"), key="Choose input folder")],
        [sg.Checkbox(T("Continuous detect mode"), default=v["Continuous detect mode"],
                     key="Continuous detect mode")],
    ]
    layout = [
        [sg.Text(T("Solar disk reconstruction from SHG video files"), font="Any 14",
                 key="Solar disk reconstruction from SHG video files"),
         sg.Push(),
         sg.Image(data=_flag_data(lang), key="_flag_icon"),
         sg.Combo(langs, key="lang_input", enable_events=True,
                  default_value=options.language, readonly=True)],
        [sg.TabGroup([[sg.Tab(T("File input mode"), file_tab, key="File input mode"),
                       sg.Tab(T("Folder input mode"), folder_tab, key="Folder input mode")]],
                     key="-tab_group-", enable_events=True)],
        [sg.Text(T("Output Folder (blank for same as input):"),
                 key="Output Folder (blank for same as input):"),
         sg.InputText(default_text=options.output_dir, size=(40, 1), key="output_dir"),
         sg.FolderBrowse(T("Choose output folder"), key="Choose output folder")],
        [sg.Checkbox(T("Show graphics"), default=v["Show graphics"], key="Show graphics"),
         sg.Checkbox(T("Save fits files"), default=v["Save fits files"], key="Save fits files"),
         sg.Checkbox(T("de-vignette"), default=v["de-vignette"], key="de-vignette")],
        [sg.Checkbox(T("Save clahe.png only"), default=v["Save clahe.png only"],
                     key="Save clahe.png only"),
         sg.Checkbox(T("Save protus.png only"), default=v["Save protus.png only"],
                     key="Save protus.png only")],
        [sg.Checkbox(T("Crop square"), default=v["Crop square"], key="Crop square"),
         sg.Text(T("Fixed image width (blank for none)"),
                 key="Fixed image width (blank for none)"),
         sg.InputText(default_text=v["_fixed_width"], size=(8, 1), key="_fixed_width")],
        # Mirror X is deliberately NOT remembered (reference
        # UI_handler.py:204 hardcodes default=False; README.md: "The
        # choice of Mirror X is deliberately not remembered")
        [sg.Checkbox(T("Mirror X"), default=False, key="Mirror X"),
         sg.Text(T("Rotate png images:"), key="Rotate png images:"),
         sg.Combo([0, 90, 180, 270], default_value=v["img_rotate"], key="img_rotate",
                  readonly=True)],
        [sg.Checkbox(T("Correct transversalium lines"),
                     default=v["Correct transversalium lines"],
                     key="Correct transversalium lines", enable_events=True),
         sg.Checkbox(T("Stubborn transversalium"), default=v["Stubborn transversalium"],
                     key="Stubborn transversalium")],
        [sg.Text(T("Transversalium correction strength (pixels x 100) :"),
                 key="Transversalium correction strength (pixels x 100) :"),
         sg.Slider(range=(1, 6), default_value=v["-trans_strength-"], resolution=0.25,
                   orientation="horizontal", key="-trans_strength-")],
        [sg.Text(T("Y/X ratio (blank for auto)"), key="Y/X ratio (blank for auto)"),
         sg.InputText(default_text=v["_y/x_ratio"], size=(8, 1), key="_y/x_ratio"),
         sg.Text(T("Tilt angle (blank for auto)"), key="Tilt angle (blank for auto)"),
         sg.InputText(default_text=v["_tilt"], size=(8, 1), key="_tilt")],
        [sg.Text(T("Pixel offset"), key="Pixel offset"),
         sg.InputText(default_text=v["_pixel_offset"], size=(14, 1), key="_pixel_offset"),
         sg.Button(T("Pixel offset live"), key="Pixel offset live")],
        [sg.Text(T("Protus adjustment"), key="Protus adjustment"),
         sg.InputText(default_text=v["_protus_adjustment"], size=(6, 1),
                      key="_protus_adjustment"),
         sg.Text(T("Ellipse fit shift [advanced]"), key="Ellipse fit shift [advanced]"),
         sg.InputText(default_text=v["ellipse_fit_shift"], size=(6, 1),
                      key="ellipse_fit_shift")],
        [sg.Button(T("OK"), key="OK"), sg.Cancel(T("Cancel"), key="Cancel"),
         sg.Push(),
         sg.Button(T("Open output folder"), key="Open output folder")],
    ]
    window = sg.Window("SHG (TPU) ", layout, finalize=True)
    try:
        while True:
            event, values = window.read()
            if event in (sg.WIN_CLOSED, "Cancel"):
                return None
            if event == "lang_input":
                options.language = values["lang_input"]
                lang = lang_dicts[langs.index(options.language)]
                window["_flag_icon"].update(data=_flag_data(lang))
                for k in popup_messages:
                    if k in lang:
                        popup_messages[k] = lang[k]
                for k, val in lang.items():
                    if k in window.AllKeysDict and not k.startswith("_"):
                        try:
                            window[k].update(text=val)
                        except Exception:
                            try:
                                window[k].update(val)
                            except Exception:
                                pass
            if event == "-tab_group-":
                options.selected_mode = values["-tab_group-"]
            if event == "Open output folder":
                # reference: UI_handler.py:259-272 (os.startfile is
                # Windows-only; use the platform opener elsewhere)
                x = str(values.get("output_dir", "")).strip()
                if not x:
                    x = (options.workDir
                         if options.selected_mode == "File input mode"
                         else str(values.get("input_dir", "")))
                if x and os.path.isdir(x):
                    _open_in_file_manager(x)
                else:
                    sg.popup_ok(popup_messages["no_folder_error"])
            if event == "Pixel offset live":
                # launches the interactive analyser; its chosen shift feeds
                # back into the pixel-offset field (reference
                # UI_handler.py:273-279)
                try:
                    interpret_form_values(options, values, no_file=True)
                    from .analyser_window import analyse_spectrum  # lazy

                    file = str(values["-FILE-"]).split(";")[0]
                    chosen = analyse_spectrum(options, file)
                    if chosen is not None:
                        window["_pixel_offset"].update(str(chosen))
                except Exception:
                    traceback.print_exc()
                    sg.popup_ok("ERROR: " + traceback.format_exc())
            if event == "OK":
                # the ACTUAL tab decides the mode (reference tab_group.Get(),
                # UI_handler.py:281) — a stale selected_mode loaded from
                # config must not override what the window shows; the window
                # always opens on the File tab (README.md:47)
                options.selected_mode = (
                    values.get("-tab_group-") or "File input mode"
                )
                # empty-input popups before interpretation (reference
                # UI_handler.py:280-297), localized
                if options.selected_mode == "File input mode" and str(
                    values.get("-FILE-", "")
                ).strip() in ("", options.workDir):
                    sg.popup_ok(popup_messages["no_file_error"])
                elif options.selected_mode == "Folder input mode" and not str(
                    values.get("input_dir", "")
                ).strip():
                    sg.popup_ok(popup_messages["no_folder_error"])
                else:
                    try:
                        return interpret_form_values(options, values)
                    except ValueError as e:
                        sg.popup_ok(str(e))
            # transversalium controls track the checkbox (reference :309-311)
            show_trans = bool(values.get("Correct transversalium lines", True))
            for k in ("-trans_strength-",
                      "Transversalium correction strength (pixels x 100) :",
                      "Stubborn transversalium"):
                window[k].update(visible=show_trans)
    finally:
        window.close()


def _open_in_file_manager(path: str) -> None:  # pragma: no cover - spawns UI
    import subprocess

    real = os.path.realpath(path)
    if hasattr(os, "startfile"):  # Windows (the reference's only path)
        os.startfile(real)  # type: ignore[attr-defined]
        return
    opener = "open" if sys.platform == "darwin" else "xdg-open"
    try:
        subprocess.Popen([opener, real], stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    except OSError:
        print(f"output folder: {real}")


def run_app() -> int:
    """GUI event loop: config round-trip + file/folder dispatch.

    reference: SHG_MAIN.py:229-246.
    """
    from ..cli.main import CONFIG_NAME, handle_files, handle_folder, read_ini, write_ini

    options = read_ini(CONFIG_NAME)
    while True:
        files = input_ui(options)
        if files is None:
            break
        if options.selected_mode == "File input mode":
            if files:
                options.workDir = os.path.dirname(files[0]) + "/"
                write_ini(options)
            handle_files(files, options)
        elif options.continuous_detect_mode:
            # live-preview watcher window (reference: SHG_MAIN.py:154-208)
            from .continuous_window import continuous_ui

            continuous_ui(options)
        else:
            handle_folder(options)
    write_ini(options)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(run_app())
