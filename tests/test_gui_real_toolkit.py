"""Real-toolkit GUI smoke test (VERDICT r2 item 6).

The stub suite (tests/test_gui_windows.py) drives every window's logic
through a scriptable FreeSimpleGUI stand-in; this module attempts the same
window construction against the REAL toolkit — an installed FreeSimpleGUI
if present, else the in-repo tkinter backend (gui/fsg_tk.py) — and records
the environment blocker when it cannot.

Environment status in this image (re-checked 2026-08-17, late round 3):
- ``FreeSimpleGUI`` is not installed and installing packages is not
  permitted in this build environment; the in-repo tkinter backend
  (gui/fsg_tk.py) removes it as a blocker — the windows run on plain
  tkinter via ``_require_sg()``'s fallback.
- ``tkinter`` IS importable (Tk 8.6) — this changed at some point during
  round 3; earlier sessions recorded _tkinter as absent.
- There is NO display server (DISPLAY/WAYLAND_DISPLAY unset) and no X
  server binary anywhere on the image (no Xvfb/Xorg/Xephyr), so
  ``tkinter.Tk()`` raises TclError: windows cannot be constructed even
  though the module imports.  ``tkinter.Tcl()`` (display-less Tcl
  interpreter) does work and is exercised below.

The tests below therefore skip with precise reasons when the toolkit is
missing, but run for real the moment the environment provides it — they
are the round-3 deliverable "window construction + one event round-trip
on real tkinter, or a recorded environment blocker".
"""

import os

import pytest


def _real_gui_blockers():
    blockers = []
    try:
        import tkinter  # noqa: F401
    except Exception as e:
        # FreeSimpleGUI would be an alternative toolkit, but it is itself
        # tkinter-based — without tkinter nothing can run
        blockers.append(f"tkinter unavailable ({e})")
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
        blockers.append("no display server (DISPLAY/WAYLAND_DISPLAY unset)")
    return blockers


BLOCKERS = _real_gui_blockers()


def test_environment_blocker_is_accurately_recorded():
    """The docstring's recorded blockers must match this environment —
    if the image ever gains tkinter/FreeSimpleGUI/a display, this fails
    and the real smoke tests below start running instead of skipping."""
    doc = __doc__
    try:
        import tkinter  # noqa: F401
        has_tk = True
    except Exception:
        has_tk = False
    if not has_tk:
        assert "tkinter" in doc and "absent" in doc
    else:
        # environment state as recorded: module imports, no tkinter blocker
        assert "IS importable" in doc
        assert not any("tkinter" in b for b in BLOCKERS)
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
        # Tk() must genuinely be impossible, not just unattempted
        if has_tk:
            import tkinter

            with pytest.raises(tkinter.TclError):
                tkinter.Tk()


def test_headless_tcl_round_trip():
    """The real Tcl interpreter (Tk's engine) runs display-less: one
    set/expr round-trip proves the toolkit's scripting core is live even
    though no window can map in this image."""
    tkinter = pytest.importorskip("tkinter")
    tcl = tkinter.Tcl()
    tcl.eval("set shift 5")
    assert tcl.eval("expr {$shift * 2}") == "10"


@pytest.mark.skipif(bool(BLOCKERS), reason="; ".join(BLOCKERS))
def test_real_toolkit_window_round_trip():
    """Window construction + one event round-trip on the REAL toolkit:
    a minimal layout using the same widget kinds the main window builds
    (Text/InputText/Checkbox/Button), read with a timeout event."""
    from solex_ser_recon_en_tpu.gui.main_window import _require_sg

    sg = _require_sg()

    layout = [
        [sg.Text("Pixel shift"), sg.InputText("0", key="-w-", size=(8, 1))],
        [sg.Checkbox("Show graphics", key="-d-")],
        [sg.Button("OK"), sg.Button("Cancel")],
    ]
    win = sg.Window("smoke", layout, finalize=True)
    try:
        win["-w-"].update("5")
        event, values = win.read(timeout=50)
        assert values["-w-"] == "5"
        assert values["-d-"] is False
    finally:
        win.close()


@pytest.mark.skipif(bool(BLOCKERS), reason="; ".join(BLOCKERS))
def test_input_ui_quit_on_real_toolkit(monkeypatch):
    """Drive the REAL main window through input_ui: close immediately via
    an injected WIN_CLOSED read (same entry the stub suite exercises)."""
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.gui import main_window
    from solex_ser_recon_en_tpu.gui.main_window import _require_sg

    sg = _require_sg()

    orig_window = sg.Window

    class AutoClose(orig_window):
        def read(self, *a, **k):
            return sg.WIN_CLOSED, None

    monkeypatch.setattr(sg, "Window", AutoClose)
    assert main_window.input_ui(Options()) is None
