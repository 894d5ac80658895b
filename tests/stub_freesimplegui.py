"""Scriptable FreeSimpleGUI stand-in.

The GUI windows (gui/main_window.py, gui/analyser_window.py) reproduce the
reference's FreeSimpleGUI front ends (UI_handler.py:169-311,
spectralAnalyserUI.py:60-391), but the package is absent in this image and
there is no display.  This stub implements exactly the API surface the
windows touch — element construction, Window.read() fed from a scripted
event sequence, element .update() capture, popups — so the REAL window code
(layout construction, event loop, language hot-swap, option mutation) runs
under pytest.

Usage: ``script([(event, {key: value, ...}), ...])`` then inject via
``sys.modules['FreeSimpleGUI'] = stub`` before the window module import.
"""

from __future__ import annotations

WIN_CLOSED = None
TIMEOUT_EVENT = "__TIMEOUT__"

_SCRIPT = []
POPUPS = []
WINDOWS = []


def script(events) -> None:
    """Queue (event, {key: value}) pairs for successive Window.read calls."""
    _SCRIPT.clear()
    _SCRIPT.extend(events)
    POPUPS.clear()
    WINDOWS.clear()


# element types whose values appear in the values dict (like real sg)
_VALUE_TYPES = {"InputText", "Checkbox", "Combo", "Slider", "Spin", "TabGroup"}


class Element:
    def __init__(self, typename, args, kw):
        self.typename = typename
        self.args = args
        self.kw = kw
        self.Key = kw.get("key")
        self.updates = []
        self.TKCanvas = object()  # for sg.Canvas consumers
        if "default" in kw:
            self.value = kw["default"]
        elif "default_value" in kw:
            self.value = kw["default_value"]
        elif "default_text" in kw:
            self.value = kw["default_text"]
        elif "initial_value" in kw:
            self.value = kw["initial_value"]
        elif typename == "InputText" and args:
            self.value = args[0]
        else:
            self.value = ""

    def update(self, *args, **kw):
        self.updates.append((args, kw))
        if args:
            self.value = args[0]
        if "value" in kw:
            self.value = kw["value"]

    @property
    def label_updates(self):
        """Texts pushed via update(text=...) / update(str) — language swap."""
        out = []
        for args, kw in self.updates:
            if "text" in kw:
                out.append(kw["text"])
            elif args and isinstance(args[0], str):
                out.append(args[0])
        return out


def _factory(name):
    def make(*args, **kw):
        return Element(name, args, kw)

    make.__name__ = name
    return make


Text = _factory("Text")
T = Text
InputText = _factory("InputText")
Checkbox = _factory("Checkbox")
Combo = _factory("Combo")
Slider = _factory("Slider")
Spin = _factory("Spin")
Button = _factory("Button")
FilesBrowse = _factory("FilesBrowse")
FolderBrowse = _factory("FolderBrowse")
Tab = _factory("Tab")
TabGroup = _factory("TabGroup")
Push = _factory("Push")
Canvas = _factory("Canvas")
Image = _factory("Image")


def Cancel(*args, **kw):
    return Element("Button", args, kw)


def popup_ok(*args, **kw):
    POPUPS.append(" ".join(str(a) for a in args))


def theme(*args, **kw):
    pass


def _walk(layout, out):
    for row in layout:
        for el in row:
            if not isinstance(el, Element):
                continue
            out.append(el)
            # recurse into nested layouts (Tab bodies, TabGroup tab grids)
            for a in el.args:
                if (isinstance(a, list) and a and isinstance(a[0], list)):
                    _walk(a, out)


class Window:
    def __init__(self, title, layout, **kw):
        self.Title = title
        self.elements = []
        _walk(layout, self.elements)
        self.AllKeysDict = {e.Key: e for e in self.elements if e.Key is not None}
        self.closed = False
        WINDOWS.append(self)

    def __getitem__(self, key):
        return self.AllKeysDict[key]

    def read(self, timeout=None):
        if not _SCRIPT:
            return WIN_CLOSED, None
        event, overrides = _SCRIPT.pop(0)
        for k, v in (overrides or {}).items():
            if k in self.AllKeysDict:
                self.AllKeysDict[k].value = v
            else:  # unknown key: remember it anyway (scripted convenience)
                e = Element("InputText", (), {"key": k})
                e.value = v
                self.elements.append(e)
                self.AllKeysDict[k] = e
        values = {
            e.Key: e.value
            for e in self.elements
            if e.Key is not None and e.typename in _VALUE_TYPES
        }
        return event, values

    def finalize(self):
        return self

    def close(self):
        self.closed = True


METER_CALLS = []


def one_line_progress_meter(title, i, n, *args):
    METER_CALLS.append((title, i, n, args))
    return True
