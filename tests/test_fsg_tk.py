"""In-repo tkinter GUI backend (gui/fsg_tk.py) — headless-safe checks.

The windows (gui/main_window.py etc.) are written against the
FreeSimpleGUI API; fsg_tk provides that API on plain tkinter.  Widget
construction needs a display (covered by tests/test_gui_real_toolkit.py
when one exists); everything testable without a display is tested here:
API-surface parity with the windows' usage, layout helpers, and the
element value model.
"""

import pytest

from solex_ser_recon_en_tpu.gui import fsg_tk


# every sg.* name the window modules reference (grep inventory)
REQUIRED_API = [
    "Text", "T", "InputText", "Checkbox", "Combo", "Slider", "Spin",
    "Button", "Cancel", "FilesBrowse", "FolderBrowse", "Tab", "TabGroup",
    "Push", "Image", "Canvas", "Window", "WIN_CLOSED", "popup_ok",
    "one_line_progress_meter", "theme",
]


def test_api_surface_complete():
    for name in REQUIRED_API:
        assert hasattr(fsg_tk, name), name
    assert fsg_tk.WIN_CLOSED is None  # windows compare `event is/in WIN_CLOSED`


def test_value_types_match_freesimplegui_contract():
    # the windows read InputText/Checkbox/Combo/Slider/Spin/TabGroup values
    # out of Window.read(); the stub encodes the same contract
    import stub_freesimplegui as stub  # tests dir is on sys.path under pytest

    assert fsg_tk._VALUE_TYPES == stub._VALUE_TYPES


def test_parse_font():
    assert fsg_tk._parse_font(None) is None
    assert fsg_tk._parse_font("Any 14") == ("TkDefaultFont", 14)
    assert fsg_tk._parse_font("Any 12") == ("TkDefaultFont", 12)
    assert fsg_tk._parse_font("Helvetica 10 bold") == ("Helvetica", 10, "bold")
    assert fsg_tk._parse_font(("Courier", 11)) == ("Courier", 11)


def test_find_browse_target():
    # FilesBrowse fills the nearest preceding InputText in its row — the
    # layout shape every window uses (Text, InputText, Browse)
    row = [fsg_tk.Text("File(s)"), fsg_tk.InputText("", key="-FILE-"),
           fsg_tk.FilesBrowse("Choose")]
    assert fsg_tk.find_browse_target(row, 2) is row[1]
    assert fsg_tk.find_browse_target(row, 1) is None
    assert fsg_tk.find_browse_target([fsg_tk.Button("OK")], 0) is None


def test_element_defaults_before_build():
    # elements carry their configured values before any tk widget exists
    assert fsg_tk.InputText(default_text="abc", key="k").get() == "abc"
    assert fsg_tk.InputText("xyz").get() == "xyz"
    assert fsg_tk.Checkbox("c", default=True).get() is True
    assert fsg_tk.Checkbox("c").get() is False
    assert fsg_tk.Combo(["EN", "FR"], default_value="FR").get() == "FR"
    assert fsg_tk.Slider(range=(1, 6), default_value=2.5).get() == 2.5
    assert fsg_tk.Spin(list(range(-999, 1000)), initial_value=0).get() == 0
    assert fsg_tk.Cancel("Annuler", key="Cancel").typename == "Button"


def test_combo_and_spin_preserve_choice_types():
    # img_rotate Combo carries ints; Spin carries ints — get() must hand
    # back the original objects, not strings
    c = fsg_tk.Combo([0, 90, 180, 270], default_value=90)
    assert c.get() == 90 and isinstance(c.get(), int)
    s = fsg_tk.Spin([1, 2, 3], initial_value=2)
    assert s.get() == 2 and isinstance(s.get(), int)


def test_tabgroup_value_is_selected_tab_key():
    t1 = fsg_tk.Tab("File input mode", [[]], key="File input mode")
    t2 = fsg_tk.Tab("Folder input mode", [[]], key="Folder input mode")
    g = fsg_tk.TabGroup([[t1, t2]], key="-tab_group-")
    # before build: the first tab is selected (window opens on File tab)
    assert g.get() == "File input mode"
    assert g.tabs == [t1, t2]


def test_filetypes_passthrough():
    b = fsg_tk.FilesBrowse(
        "Choose", file_types=(("Video Files (SER, AVI)", "*.ser *.avi"),)
    )
    assert b._filetypes() == [("Video Files (SER, AVI)", "*.ser *.avi")]
    assert fsg_tk.FolderBrowse("Choose")._filetypes() == [("All Files", "*.*")]


def test_require_sg_resolves_some_toolkit():
    """_require_sg must return a module exposing the windows' API —
    FreeSimpleGUI, the test stub, or fsg_tk — or raise the documented
    RuntimeError when no toolkit exists at all."""
    from solex_ser_recon_en_tpu.gui.main_window import _require_sg

    try:
        sg = _require_sg()
    except RuntimeError as e:
        assert "toolkit" in str(e)
        return
    for name in ("Window", "Text", "Button", "WIN_CLOSED", "popup_ok"):
        assert hasattr(sg, name)


def test_main_window_constructs_on_fsg_tk(microx_display, monkeypatch):
    """On the in-repo display (gui/microx.py): the REAL main window builds
    and round-trips one event on the in-repo tkinter backend, no
    FreeSimpleGUI involved."""
    import sys

    monkeypatch.delitem(sys.modules, "FreeSimpleGUI", raising=False)
    monkeypatch.setattr(
        "solex_ser_recon_en_tpu.gui.main_window._require_sg",
        lambda: fsg_tk,
    )
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.gui import main_window

    win_holder = {}
    orig_window = fsg_tk.Window

    class AutoClose(orig_window):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            win_holder["w"] = self

        def read(self, *a, **k):
            self.close()
            return fsg_tk.WIN_CLOSED, None

    monkeypatch.setattr(fsg_tk, "Window", AutoClose)
    assert main_window.input_ui(Options()) is None
    assert win_holder["w"]._closed
