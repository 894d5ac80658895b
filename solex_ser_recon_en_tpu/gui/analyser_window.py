"""Interactive spectral-analyser window (FreeSimpleGUI + matplotlib, gated).

reference: spectralAnalyserUI.py:60-391 — file load / Start analysis,
anchor+target combos, GOTO wavelength entry, Auto dispersion, live preview
of the mean image + spectrum-vs-atlas overlay + CLAHE/protus quick looks,
Save image.  All numerics come from the tested headless core
(analyser/core.py); this module is only the event loop + plotting.

Needs FreeSimpleGUI and a display; headless installs use
``python -m solex_ser_recon_en_tpu.cli.analyse``.
"""

from __future__ import annotations

import os
import traceback
from typing import Optional

import numpy as np

from ..analyser import SpectralAnalyser
from ..analyser.atlas import anchor_table, load_atlas, target_table
from ..config import Options


def analyse_spectrum(options: Options, file: Optional[str] = None):
    """Show the analyser window; returns the chosen pixel shift (or None).

    reference: spectralAnalyserUI.py:60 (analyseSpectrum) — the return value
    feeds the main window's pixel-offset field (UI_handler.py:276).
    """
    try:
        from .main_window import _require_sg

        sg = _require_sg()
        from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg
        from matplotlib.figure import Figure
    except Exception as e:
        raise RuntimeError(
            "the analyser GUI needs a toolkit (FreeSimpleGUI or tkinter) "
            "+ a display; use python -m solex_ser_recon_en_tpu.cli.analyse "
            "instead"
        ) from e

    a_waves, a_names, anchors = anchor_table()
    t_waves, t_names, targets = target_table()
    atlas = load_atlas()

    fig = Figure(figsize=(11, 8), tight_layout=True)
    ((ax1, ax3), (ax2, ax4)) = fig.subplots(2, 2)

    layout = [
        [sg.Text("File"), sg.InputText(options.specDir, size=(60, 1), key="-FILE2-"),
         sg.FilesBrowse("Choose file", file_types=(("Video Files", "*.ser *.avi"),)),
         sg.Button("Start analysis"), sg.Button("Save image"), sg.Button("Exit")],
        [sg.T("Anchor line"), sg.Combo(anchors, readonly=True, key="-anchor-", enable_events=True),
         sg.T("GOTO line"), sg.Combo(targets, readonly=True, key="-target-", enable_events=True),
         sg.T("GOTO wavelength (Å)"), sg.InputText("", key="-ashift-", size=(10, 1)),
         sg.T("Pixel shift"), sg.Spin(list(range(-999, 1000)), initial_value=0, size=4,
                                      enable_events=True, key="-shift-"),
         sg.T("Wavelength shift: None", key="-wshift-")],
        [sg.T("Dispersion (Å/pixel)"), sg.InputText(str(options.dispersion),
                                                    key="-dispersion-", size=(10, 1)),
         sg.Button("Auto dispersion"), sg.Button("GOTO")],
        [sg.Canvas(size=(1100, 800), key="canvas")],
    ]
    window = sg.Window("Spectral Analyser", layout, finalize=True, resizable=True)
    graph = FigureCanvasTkAgg(fig, master=window["canvas"].TKCanvas)
    graph.get_tk_widget().pack(side="top", fill="both", expand=1)

    analyser: Optional[SpectralAnalyser] = None
    shift = 0

    def anchor_wavelength(values) -> Optional[float]:
        if not values["-anchor-"]:
            return None
        return a_waves[anchors.index(values["-anchor-"])]

    def refresh(values) -> None:
        if analyser is None:
            return
        ax1.cla(), ax2.cla(), ax3.cla(), ax4.cla()
        ax3.axis("off"), ax4.axis("off")
        st = analyser.state
        ax1.imshow(analyser.mean_img, cmap="gray", aspect="auto")
        ih = analyser.mean_img.shape[0]
        ax1.plot(st.fit_curve + shift, range(ih), "r--")
        ax1.plot(st.fit_curve, range(ih), "b")
        spec = np.log(np.maximum(st.spectrum2.astype(float), 1e-9))
        if analyser.dispersion:
            aw = anchor_wavelength(values) or 6562.808
            lam = (np.arange(spec.shape[0]) - st.anchor_x) * analyser.dispersion + aw
            ax2.plot(lam, spec, color="green", label="data")
            tbl = atlas.table()
            sel = tbl[(tbl[:, 0] >= lam.min()) & (tbl[:, 0] <= lam.max())]
            if len(sel):
                twin = ax2.twinx()
                twin.plot(sel[:, 0], sel[:, 1], color="purple", label="reference")
            ax2.axvline(x=aw, color="blue")
            ax2.axvline(x=aw + shift * analyser.dispersion, color="red", linestyle="--")
            ax2.set_xlabel(f"wavelength (Å); dispersion {analyser.dispersion:.4f} Å/px")
            window["-wshift-"].update(
                f"Wavelength shift: {shift * analyser.dispersion:.3f}Å"
            )
            window["-ashift-"].update(f"{aw + shift * analyser.dispersion:.3f}")
        else:
            ax2.plot(spec, color="green", label="data")
            ax2.axvline(x=st.anchor_x, color="blue")
            ax2.axvline(x=st.anchor_x + shift, color="red", linestyle="--")
        ax2.grid()
        clahe_img, protus = analyser.preview(shift)
        ax3.imshow(np.asarray(clahe_img), cmap="gray")
        ax4.imshow(np.asarray(protus), cmap="gray")
        graph.draw()

    while True:
        event, values = window.read(timeout=50)
        if event in (sg.WIN_CLOSED, "Exit"):
            window.close()
            return shift if values else None
        try:
            if event == "Start analysis":
                f = (values["-FILE2-"] or file or "").split(";")[0]
                options.specDir = os.path.dirname(f)
                analyser = SpectralAnalyser(f, options, atlas=atlas)
                shift = 0
                refresh(values)
            elif event == "Auto dispersion" and analyser is not None:
                aw = anchor_wavelength(values)
                if aw is None:
                    sg.popup_ok("Choose an anchor first!")
                else:
                    d = analyser.find_dispersion(aw)
                    window["-dispersion-"].update(f"{d:.6f}")
                    options.dispersion = d
                    refresh(values)
            elif event == "-dispersion-" and analyser is not None:
                # manual dispersion entry (reference: '-dispersion-_Enter',
                # spectralAnalyserUI.py:225-238 — must be positive)
                try:
                    d = float(values["-dispersion-"])
                    if d <= 0:
                        raise ValueError("dispersion must be positive")
                    analyser.dispersion = d
                    options.dispersion = round(d, 6)
                    if values["-anchor-"]:
                        refresh(values)
                    else:
                        sg.popup_ok("Choose an anchor first!")
                except ValueError:
                    sg.popup_ok("Invalid dispersion")
            elif event in ("-target-", "GOTO") and analyser is not None:
                aw = anchor_wavelength(values)
                if aw is None or analyser.dispersion is None:
                    sg.popup_ok("Load a file and find dispersion first!")
                    continue
                if event == "-target-" and values["-target-"]:
                    tw = t_waves[targets.index(values["-target-"])]
                else:
                    tw = float(values["-ashift-"])
                s, status = analyser.shift_for(tw, aw)
                if status == "out":
                    sg.popup_ok("That line does not appear to be in image!")
                    continue
                if status == "partial":
                    sg.popup_ok("Warning: Line is only partially within frame")
                shift = s
                window["-shift-"].update(shift)
                refresh(values)
            elif event == "-shift-" and analyser is not None:
                shift = int(values["-shift-"])
                refresh(values)
            elif event == "Save image" and analyser is not None:
                f = (values["-FILE2-"] or file or "").split(";")[0]
                base = os.path.splitext(f)[0] + f"_shift={shift}"
                analyser.save(shift, base)
        except Exception:
            traceback.print_exc()
            sg.popup_ok("ERROR: " + traceback.format_exc())
