"""Exercise the REAL GUI windows under the scriptable FreeSimpleGUI stub.

These tests construct gui/main_window.py's and gui/analyser_window.py's
actual layouts and pump their actual event loops (language hot-swap, tab
switch, validation popups, OK/Cancel, analyser start/dispersion/GOTO/save)
— the stub only replaces widget rendering.  reference: UI_handler.py:169-311,
SHG_MAIN.py:229-246, spectralAnalyserUI.py:60-391.
"""

import os
import sys
import types

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options

import stub_freesimplegui as stub  # tests dir is on sys.path under pytest


@pytest.fixture(autouse=True)
def _inject_stub(monkeypatch):
    monkeypatch.setitem(sys.modules, "FreeSimpleGUI", stub)
    # analyser window's matplotlib tk canvas: replace with a no-op shim
    shim = types.ModuleType("matplotlib.backends.backend_tkagg")

    class FigureCanvasTkAgg:
        def __init__(self, fig, master=None):
            self.figure = fig

        def get_tk_widget(self):
            return self

        def pack(self, **kw):
            pass

        def draw(self):
            pass

    shim.FigureCanvasTkAgg = FigureCanvasTkAgg
    monkeypatch.setitem(sys.modules, "matplotlib.backends.backend_tkagg", shim)
    yield


def test_main_window_ok_path(basic_scan, tmp_path):
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    path = basic_scan["path"]
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    stub.script([
        ("OK", {"-FILE-": path, "_pixel_offset": "0:4:2",
                "Save fits files": True, "output_dir": outdir,
                "_fixed_width": "123", "Mirror X": True}),
    ])
    opts = Options()
    files = input_ui(opts)
    assert files == [path]
    assert opts.shift == [0, 2, 4]
    assert opts.save_fit is True
    assert opts.fixed_width == 123
    assert opts.flip_x is True
    assert opts.output_dir == outdir
    assert stub.WINDOWS[0].closed


def test_main_window_language_hot_swap_all_13():
    from solex_ser_recon_en_tpu.gui.main_window import input_ui
    from solex_ser_recon_en_tpu.i18n import read_langs

    langs, dicts = read_langs()
    # full parity: the reference ships 12 dict_lang_*.txt files
    assert len(langs) >= 12
    stub.script(
        [("lang_input", {"lang_input": name}) for name in langs]
        + [("Cancel", {})]
    )
    opts = Options()
    assert input_ui(opts) is None
    assert opts.language == langs[-1]
    win = stub.WINDOWS[0]
    # the OK button label followed every language swap
    ok_labels = win["OK"].label_updates
    want = [d.get("OK", "OK") for d in dicts]
    assert ok_labels == want
    # a representative checkbox label swapped too
    assert len(win["Mirror X"].label_updates) == len(langs)


def test_main_window_validation_popup_then_cancel():
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    stub.script([
        # a file is entered (the empty-file gate passes, UI_handler.py:283),
        # then the garbage offset raises -> popup, loop continues
        ("OK", {"_pixel_offset": "garbage", "-FILE-": "scan.ser"}),
        ("Cancel", {}),
    ])
    assert input_ui(Options()) is None
    assert stub.POPUPS == ["invalid pixel offset value!"]


def test_main_window_tab_switch_sets_mode(tmp_path):
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    folder = str(tmp_path / "watch")
    os.makedirs(folder)
    stub.script([
        ("-tab_group-", {"-tab_group-": "Folder input mode"}),
        ("OK", {"input_dir": folder, "Continuous detect mode": True}),
    ])
    opts = Options()
    files = input_ui(opts)
    assert files == []
    assert opts.selected_mode == "Folder input mode"
    assert opts.input_dir == folder
    assert opts.continuous_detect_mode is True


def test_main_window_win_closed():
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    stub.script([])  # read() immediately reports WIN_CLOSED
    assert input_ui(Options()) is None


def test_run_app_event_loop(basic_scan, tmp_path, monkeypatch):
    """run_app: config round-trip + file dispatch (SHG_MAIN.py:229-246)."""
    import importlib

    import solex_ser_recon_en_tpu.gui.main_window as mw

    # cli/__init__ re-exports a `main` function that shadows the submodule
    # on attribute-style imports
    cli_main = importlib.import_module("solex_ser_recon_en_tpu.cli.main")

    monkeypatch.chdir(tmp_path)
    calls = []
    monkeypatch.setattr(cli_main, "handle_files",
                        lambda files, options, *a, **k: calls.append(files))
    stub.script([
        ("OK", {"-FILE-": basic_scan["path"], "_pixel_offset": "7"}),
        # second input_ui round ends the app (script exhausted -> WIN_CLOSED)
    ])
    assert mw.run_app() == 0
    assert calls == [[basic_scan["path"]]]
    # options were persisted with the entered shift
    saved = cli_main.read_ini(str(tmp_path / "SHG_config.txt"))
    assert saved.shift == [7]


@pytest.fixture(scope="module")
def analyser_scan(tmp_path_factory):
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    p = str(tmp_path_factory.mktemp("gui_an") / "scan.ser")
    SyntheticScan(
        ih=220, iw=120, frames=180, depth=16,
        line_poly=(60.0, 0.0, 0.0, 0.0), disk_radius=70.0,
        noise=0.002, seed=9,
    ).write(p)
    return p


def test_analyser_window_full_session(analyser_scan):
    from solex_ser_recon_en_tpu.analyser.atlas import anchor_table
    from solex_ser_recon_en_tpu.gui.analyser_window import analyse_spectrum

    a_waves, a_names, anchors = anchor_table()
    halpha = anchors[int(np.argmin(np.abs(np.asarray(a_waves) - 6562.808)))]
    base = os.path.splitext(analyser_scan)[0]
    stub.script([
        ("Start analysis", {"-FILE2-": analyser_scan}),
        ("Auto dispersion", {"-anchor-": halpha}),
        ("-shift-", {"-shift-": 3}),
        ("GOTO", {"-ashift-": "6563.2"}),
        ("Save image", {}),
        ("Exit", {}),
    ])
    opts = Options()
    shift = analyse_spectrum(opts, analyser_scan)
    assert stub.POPUPS == []
    assert 0.02 <= opts.dispersion <= 0.12       # Auto dispersion landed
    assert shift == int(round((6563.2 - 6562.808) / opts.dispersion)) or shift >= 1
    win = stub.WINDOWS[0]
    assert win["-dispersion-"].label_updates     # dispersion field updated
    saved = [f for f in os.listdir(os.path.dirname(analyser_scan))
             if "_shift=" in f and f.endswith(".png")]
    assert saved, "Save image wrote nothing"
    assert base  # silence lint


def test_analyser_window_goto_without_dispersion_pops(analyser_scan):
    from solex_ser_recon_en_tpu.gui.analyser_window import analyse_spectrum

    stub.script([
        ("Start analysis", {"-FILE2-": analyser_scan}),
        ("GOTO", {"-ashift-": "6563.0", "-anchor-": ""}),
        ("Exit", {}),
    ])
    analyse_spectrum(Options(), analyser_scan)
    assert any("dispersion" in p for p in stub.POPUPS)


def test_clahe_window_full_session(tmp_path, monkeypatch):
    """CLAHE tool GUI: validation popup, language swap, OK -> files
    processed with the entered settings (reference clahe_apply.py:113-240)."""
    import numpy as np

    from solex_ser_recon_en_tpu.io.png import write_png, read_image
    import solex_ser_recon_en_tpu.gui.clahe_window as cw

    monkeypatch.chdir(tmp_path)
    img = (np.random.default_rng(3).integers(0, 65536, (64, 80))
           .astype(np.uint16))
    src = tmp_path / "in.png"
    write_png(str(src), img)

    stub.script([
        ("OK", {"-FILE-": ""}),                       # no file -> popup
        ("OK", {"-FILE-": str(src), "do_stretch": True,
                "lo": 60, "hi": 40, "sat": 80}),      # hi <= lo -> popup
        ("lang_input", {"lang_input": "Deutsch"}),
        ("OK", {"lo": 5, "hi": 95, "tile_size": 3}),
    ])
    assert cw.run_app() == 0
    assert len(stub.POPUPS) == 2
    out = tmp_path / "in_clahe.png"
    assert out.exists()
    res = read_image(str(out))
    assert res.shape == img.shape
    # settings persisted to clahe_config.txt
    import json

    cfg = json.loads((tmp_path / "clahe_config.txt").read_text())
    assert cfg["tile_size"] == 3 and cfg["do_stretch"] is True
    assert cfg["language"] == "Deutsch"


def test_continuous_window_processes_and_previews(tmp_path):
    """The continuous-detect window (SHG_MAIN.py:154-208 equivalent)
    processes a newly appearing scan, updates counters + the live CLAHE
    preview, and exits on Stop."""
    from solex_ser_recon_en_tpu.gui.continuous_window import continuous_ui
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    indir = tmp_path / "watch"
    indir.mkdir()
    scan = SyntheticScan(ih=128, iw=64, frames=60, depth=16,
                         line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                         seed=2)
    scan.write(str(indir / "new.ser"), transpose_to_wide=True)

    opts = Options(shift=[0], clahe_only=True, _nolog=False,
                   ratio_fixe=1.0, slant_fix=0.0,
                   input_dir=str(indir), output_dir=str(tmp_path / "out"))
    (tmp_path / "out").mkdir()

    stub.script([
        (stub.TIMEOUT_EVENT, {}),  # poll 1: finds + processes new.ser
        (stub.TIMEOUT_EVENT, {}),  # poll 2: nothing new
        ("Stop", {}),
    ])
    n = continuous_ui(opts, poll_seconds=0.01)
    assert n == 1
    win = stub.WINDOWS[-1]
    assert win.closed
    assert any("Number of files processed: 1" in u
               for u in win["auto_info"].label_updates)
    # the preview image was pushed PNG bytes
    img_updates = [kw for (a, kw) in win["_prev_img"].updates if "data" in kw]
    assert img_updates and img_updates[-1]["data"][:4] == b"\x89PNG"
    assert any(u.startswith("Last: ") for u in win["last"].label_updates)


def test_continuous_window_empty_folder_stop(tmp_path):
    from solex_ser_recon_en_tpu.gui.continuous_window import continuous_ui

    indir = tmp_path / "empty"
    indir.mkdir()
    opts = Options(shift=[0], input_dir=str(indir),
                   output_dir=str(tmp_path))
    stub.script([(stub.TIMEOUT_EVENT, {}), ("Stop", {})])
    assert continuous_ui(opts, poll_seconds=0.01) == 0
    assert any("Looking for files" in u
               for u in stub.WINDOWS[-1]["status_info"].label_updates)


def test_main_window_flag_icon_and_popups(tmp_path, monkeypatch):
    """Language swap updates the flag icon; OK with empty file and Open
    output folder with no folder pop the LOCALIZED error messages
    (UI_handler.py:139-144,259-297)."""
    import solex_ser_recon_en_tpu.gui.main_window as mw

    opened = []
    monkeypatch.setattr(mw, "_open_in_file_manager", opened.append)

    opts = Options(workDir="")
    stub.script([
        ("lang_input", {"lang_input": "Français"}),
        ("OK", {"-FILE-": ""}),                      # no file -> popup
        ("Open output folder", {"output_dir": ""}),  # no folder -> popup
        ("Open output folder", {"output_dir": str(tmp_path)}),
        ("Cancel", {}),
    ])
    assert mw.input_ui(opts) is None

    win = stub.WINDOWS[-1]
    flag_updates = [kw for (a, kw) in win["_flag_icon"].updates if "data" in kw]
    assert flag_updates and flag_updates[-1]["data"][:4] == b"\x89PNG"

    import json
    fr = json.load(open(
        "solex_ser_recon_en_tpu/data/language/dict_lang_FR.txt",
        encoding="utf-8"))
    assert fr["no_file_error"] in stub.POPUPS
    assert fr["no_folder_error"] in stub.POPUPS
    assert opened == [str(tmp_path)]


def test_main_window_transversalium_visibility():
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    stub.script([
        ("Correct transversalium lines", {"Correct transversalium lines": False}),
        ("Cancel", {}),
    ])
    assert input_ui(Options()) is None
    win = stub.WINDOWS[-1]
    vis = [kw["visible"] for (a, kw) in win["-trans_strength-"].updates
           if "visible" in kw]
    assert vis and vis[0] is False


def test_analyser_window_manual_dispersion(analyser_scan):
    """Manual dispersion entry (reference '-dispersion-_Enter',
    spectralAnalyserUI.py:225-238): a positive value is adopted, zero or
    garbage pops 'Invalid dispersion'."""
    from solex_ser_recon_en_tpu.analyser.atlas import anchor_table
    from solex_ser_recon_en_tpu.gui.analyser_window import analyse_spectrum

    a_waves, a_names, anchors = anchor_table()
    halpha = anchors[int(np.argmin(np.abs(np.asarray(a_waves) - 6562.808)))]
    stub.script([
        ("Start analysis", {"-FILE2-": analyser_scan}),
        ("-dispersion-", {"-dispersion-": "0.0550", "-anchor-": halpha}),
        ("GOTO", {"-ashift-": "6563.2"}),
        ("-dispersion-", {"-dispersion-": "-1"}),
        ("-dispersion-", {"-dispersion-": "garbage"}),
        ("Exit", {}),
    ])
    opts = Options()
    shift = analyse_spectrum(opts, analyser_scan)
    assert opts.dispersion == 0.055
    assert shift == int((6563.2 - 6562.808) / 0.055)
    assert stub.POPUPS.count("Invalid dispersion") == 2


def test_batch_progress_meter(basic_scan, tmp_path, monkeypatch):
    """GUI multi-file batches drive the reference's progress meter
    (Solex_recon.py:34-44); CLI runs do not."""
    import shutil

    from solex_ser_recon_en_tpu.cli.main import handle_files

    stub.METER_CALLS.clear()
    f1 = str(tmp_path / "a.ser")
    f2 = str(tmp_path / "b.ser")
    shutil.copy(basic_scan["path"], f1)
    shutil.copy(basic_scan["path"], f2)
    opts = Options(shift=[0], clahe_only=True, _nolog=True,
                   ratio_fixe=1.0, slant_fix=0.0,
                   output_dir=str(tmp_path))
    assert handle_files([f1, f2], opts) == 2
    assert stub.METER_CALLS[0][1:3] == (0, 2)
    assert stub.METER_CALLS[-1][1:3] == (2, 2)

    stub.METER_CALLS.clear()
    assert handle_files([f1], opts, flag_command_line=True) == 1
    assert stub.METER_CALLS == []


def test_ok_uses_actual_tab_not_stale_config_mode(basic_scan, tmp_path):
    """A selected_mode='Folder input mode' loaded from config must not
    override the tab the window actually shows — the window opens on the
    File tab and OK reads the real tab (UI_handler.py:281, README.md:47)."""
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    opts = Options()
    opts.selected_mode = "Folder input mode"  # stale config state
    stub.script([
        ("OK", {"-FILE-": basic_scan["path"], "_pixel_offset": "0"}),
    ])
    files = input_ui(opts)
    assert files == [basic_scan["path"]]
    assert opts.selected_mode == "File input mode"


def test_mirror_x_not_remembered():
    """The Mirror X checkbox always opens unchecked, even when the current
    options have flip_x=True (reference UI_handler.py:204 + README: "The
    choice of Mirror X is deliberately not remembered")."""
    from solex_ser_recon_en_tpu.gui.main_window import input_ui

    stub.script([("Cancel", {})])
    opts = Options(flip_x=True)
    input_ui(opts)
    win = stub.WINDOWS[-1]
    cb = [e for e in win.elements if e.Key == "Mirror X"][0]
    assert cb.value is False
