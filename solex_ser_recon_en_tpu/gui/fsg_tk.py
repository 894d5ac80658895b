"""In-repo FreeSimpleGUI-compatible toolkit on tkinter/ttk.

The reference app builds its windows on FreeSimpleGUI
(reference: UI_handler.py:169-311, spectralAnalyserUI.py:60-391, a thin
layer over tkinter).  This framework's windows speak the same API; this
module provides that API directly on the standard library's tkinter, so
the GUI runs with NO third-party GUI dependency — any Python built with
Tk opens the real windows.  ``gui.main_window._require_sg()`` prefers an
installed FreeSimpleGUI and falls back here.

Only the API surface the windows use is implemented:

- elements: Text/T, InputText, Checkbox, Combo, Slider, Spin, Button,
  Cancel, FilesBrowse, FolderBrowse, Tab, TabGroup, Push, Image, Canvas
- ``Window(title, layout, finalize=..., resizable=...)`` with
  ``read(timeout=)``, ``close()``, ``window[key]``, ``AllKeysDict``
- ``element.update(value | text= | visible= | data= | values=)``
- ``WIN_CLOSED``, ``TIMEOUT_EVENT``, ``popup_ok``,
  ``one_line_progress_meter``, ``theme``

Layout semantics mirror FreeSimpleGUI: a layout is a list of rows, each
row a list of elements packed left-to-right; ``Push`` absorbs horizontal
slack; browse buttons fill the nearest preceding ``InputText`` in their
row.  Each element sits inside its own holder frame so
``update(visible=False/True)`` unmaps and remaps without losing its
position.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

WIN_CLOSED = None
TIMEOUT_EVENT = "__TIMEOUT__"

# element types whose values appear in Window.read()'s values dict
# (matches FreeSimpleGUI and the test stub's `_VALUE_TYPES`)
_VALUE_TYPES = {"InputText", "Checkbox", "Combo", "Slider", "Spin", "TabGroup"}

_theme_name = "SystemDefault"


def theme(name: Optional[str] = None) -> str:
    """Accepted for API compatibility; tkinter's native look is kept."""
    global _theme_name
    if name:
        _theme_name = name
    return _theme_name


def _parse_font(font) -> Optional[tuple]:
    """FreeSimpleGUI font spec ('Any 14', ('Helvetica', 12), ...) to a
    tkinter font tuple.  'Any' means the default family (size-only)."""
    if font is None:
        return None
    if isinstance(font, (tuple, list)):
        return tuple(font)
    parts = str(font).split()
    fam, size, styles = "TkDefaultFont", None, []
    for p in parts:
        if p.isdigit():
            size = int(p)
        elif p.lower() in ("bold", "italic", "underline"):
            styles.append(p.lower())
        elif p.lower() != "any":
            fam = p
    out = [fam, size if size is not None else 10] + styles
    return tuple(out)


def find_browse_target(row: Sequence["Element"], browse_idx: int):
    """The input element a browse button fills: the nearest preceding
    InputText in the same row (FreeSimpleGUI's default target).  Pure
    function so the resolution rule is testable headless."""
    for el in reversed(list(row[:browse_idx])):
        if getattr(el, "typename", None) == "InputText":
            return el
    return None


_root = None
_root_failed_display = ()  # sentinel: () = no cached failure


def _tk_root():
    """Singleton withdrawn Tk root; every Window is a Toplevel of it, so
    multiple sequential/nested windows and popups share one interpreter.

    A failed creation (no display) is cached per $DISPLAY value so a
    headless batch doesn't pay a ~3 ms _tkinter.create attempt for every
    progress tick; pointing $DISPLAY at a server later retries."""
    global _root, _root_failed_display
    import os

    import tkinter as tk

    if _root is not None:
        try:
            _root.winfo_exists()
            return _root
        except tk.TclError:
            _root = None
    display = os.environ.get("DISPLAY")
    if _root_failed_display != () and _root_failed_display == display:
        raise tk.TclError("no display (cached from a previous attempt)")
    try:
        _root = tk.Tk()
    except tk.TclError as e:
        # Only cache genuinely-missing-display failures: a transient Tk
        # hiccup (momentary X server restart, resource blip) must not
        # permanently disable all GUI windows for the process.
        msg = str(e).lower()
        if "display" in msg:
            _root_failed_display = display
        raise
    _root_failed_display = ()
    _root.withdraw()
    return _root


class Element:
    """Base element: construction kwargs are stored; the tk widget is
    created when the owning Window builds its layout."""

    typename = "Element"

    def __init__(self, *args, **kw):
        self.args = args
        self.kw = kw
        self.Key = kw.get("key")
        self.widget = None  # the tk widget (set at build)
        self._holder = None  # per-element frame (visibility anchor)
        self._window: Optional[Window] = None
        self._visible = kw.get("visible", True)

    # -- construction ---------------------------------------------------
    def _build(self, parent, window: "Window"):  # pragma: no cover - GUI
        raise NotImplementedError

    def _attach(self, parent, window: "Window", **pack_kw):  # pragma: no cover
        """Create the holder frame, build the widget inside it, pack."""
        import tkinter as tk

        self._window = window
        self._holder = tk.Frame(parent)
        self._holder.pack(side="left", **pack_kw)
        self._build(self._holder, window)
        if self.widget is not None and self._visible:
            self.widget.pack(side="left", padx=2, pady=2)

    # -- runtime --------------------------------------------------------
    def get(self):
        return None

    def update(self, *args, **kw):  # pragma: no cover - GUI
        import tkinter as tk

        if "visible" in kw and self.widget is not None:
            vis = bool(kw["visible"])
            if vis and not self._visible:
                self.widget.pack(side="left", padx=2, pady=2)
            elif not vis and self._visible:
                self.widget.pack_forget()
            self._visible = vis
        text = kw.get("text")
        if text is None and args and isinstance(args[0], str) \
                and not self._takes_positional_value():
            text = args[0]
        if text is not None and self.widget is not None:
            self.widget.config(text=text)  # raises TclError if unsupported
        if "disabled" in kw and self.widget is not None:
            try:
                self.widget.config(
                    state=tk.DISABLED if kw["disabled"] else tk.NORMAL
                )
            except tk.TclError:
                pass

    def _takes_positional_value(self) -> bool:
        """Whether update(x) means 'set value' (inputs) or 'set label'."""
        return False

    # FreeSimpleGUI exposes the underlying tk widget as .Widget
    @property
    def Widget(self):
        return self.widget


class Text(Element):
    typename = "Text"

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter.ttk as ttk

        self.widget = ttk.Label(
            parent,
            text=self.args[0] if self.args else "",
            font=_parse_font(self.kw.get("font")),
        )


T = Text


class InputText(Element):
    typename = "InputText"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._value = kw.get(
            "default_text", args[0] if args else ""
        )
        self._var = None

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk

        self._var = tk.StringVar(master=parent, value=str(self._value))
        size = self.kw.get("size", (20, 1))
        self.widget = tk.Entry(parent, textvariable=self._var, width=size[0])

    def get(self):
        return self._var.get() if self._var is not None else self._value

    def _takes_positional_value(self):
        return True

    def update(self, *args, **kw):  # pragma: no cover - GUI
        val = kw.get("value", args[0] if args else None)
        if val is not None:
            if self._var is not None:
                self._var.set(str(val))
            self._value = str(val)
        super().update(**{k: v for k, v in kw.items() if k != "value"})


class Checkbox(Element):
    typename = "Checkbox"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._value = bool(kw.get("default", False))
        self._var = None

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk
        import tkinter.ttk as ttk

        self._var = tk.BooleanVar(master=parent, value=self._value)
        cmd = None
        if self.kw.get("enable_events") and self.Key is not None:
            cmd = lambda: window._post(self.Key)  # noqa: E731
        self.widget = ttk.Checkbutton(
            parent, text=self.args[0] if self.args else "",
            variable=self._var, command=cmd,
        )

    def get(self):
        return bool(self._var.get()) if self._var is not None else self._value

    def update(self, *args, **kw):  # pragma: no cover - GUI
        val = kw.get("value", args[0] if args and isinstance(args[0], bool) else None)
        if val is not None:
            if self._var is not None:
                self._var.set(bool(val))
            self._value = bool(val)
        super().update(*args, **{k: v for k, v in kw.items() if k != "value"})


class Combo(Element):
    typename = "Combo"

    def __init__(self, values=(), *args, **kw):
        super().__init__(values, *args, **kw)
        self.values = list(values)
        self._value = kw.get("default_value", self.values[0] if self.values else "")
        self._widgetvar = None

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk
        import tkinter.ttk as ttk

        self._widgetvar = tk.StringVar(master=parent, value=str(self._value))
        state = "readonly" if self.kw.get("readonly") else "normal"
        self.widget = ttk.Combobox(
            parent, values=[str(v) for v in self.values],
            textvariable=self._widgetvar, state=state,
            width=max((len(str(v)) for v in self.values), default=8) + 2,
        )
        if self.kw.get("enable_events") and self.Key is not None:
            self.widget.bind(
                "<<ComboboxSelected>>", lambda e: window._post(self.Key)
            )

    def get(self):
        cur = (
            self._widgetvar.get() if self._widgetvar is not None
            else str(self._value)
        )
        # return the original (possibly non-str) choice object
        for v in self.values:
            if str(v) == cur:
                return v
        return cur

    def update(self, *args, **kw):  # pragma: no cover - GUI
        if "values" in kw:
            self.values = list(kw["values"])
            if self.widget is not None:
                self.widget.config(values=[str(v) for v in self.values])
        val = kw.get("value", args[0] if args else None)
        if val is not None:
            if self._widgetvar is not None:
                self._widgetvar.set(str(val))
            self._value = val
        super().update(**{k: v for k, v in kw.items()
                          if k not in ("value", "values")})


class Slider(Element):
    typename = "Slider"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.range = kw.get("range", (0, 100))
        self._value = float(kw.get("default_value", self.range[0]))
        self._var = None

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk

        self._var = tk.DoubleVar(master=parent, value=self._value)
        orient = ("horizontal"
                  if str(self.kw.get("orientation", "h")).startswith("h")
                  else "vertical")
        self.widget = tk.Scale(
            parent, from_=self.range[0], to=self.range[1],
            resolution=self.kw.get("resolution", 1),
            orient=orient, variable=self._var, length=180,
        )

    def get(self):
        return float(self._var.get()) if self._var is not None else self._value

    def _takes_positional_value(self):
        return True

    def update(self, *args, **kw):  # pragma: no cover - GUI
        val = kw.get("value", args[0] if args else None)
        if val is not None:
            if self._var is not None:
                self._var.set(float(val))
            self._value = float(val)
        super().update(**{k: v for k, v in kw.items() if k != "value"})


class Spin(Element):
    typename = "Spin"

    def __init__(self, values=(), *args, **kw):
        super().__init__(values, *args, **kw)
        self.values = list(values)
        self._value = kw.get(
            "initial_value", self.values[0] if self.values else 0
        )
        self._var = None

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk

        self._var = tk.StringVar(master=parent, value=str(self._value))
        size = self.kw.get("size", 6)
        width = size[0] if isinstance(size, (tuple, list)) else int(size)
        kw = dict(textvariable=self._var, width=width, wrap=True)
        if self.kw.get("enable_events") and self.Key is not None:
            kw["command"] = lambda: window._post(self.Key)
        self.widget = tk.Spinbox(parent, values=[str(v) for v in self.values],
                                 **kw)
        self._var.set(str(self._value))  # Spinbox(values=) resets the var

    def get(self):
        cur = self._var.get() if self._var is not None else str(self._value)
        for v in self.values:  # preserve original typing (ints stay ints)
            if str(v) == cur:
                return v
        return cur

    def _takes_positional_value(self):
        return True

    def update(self, *args, **kw):  # pragma: no cover - GUI
        val = kw.get("value", args[0] if args else None)
        if val is not None:
            if self._var is not None:
                self._var.set(str(val))
            self._value = val
        super().update(**{k: v for k, v in kw.items() if k != "value"})


class Button(Element):
    typename = "Button"

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter.ttk as ttk

        label = self.args[0] if self.args else self.kw.get(
            "button_text", "Button"
        )
        event = self.Key if self.Key is not None else label
        self.widget = ttk.Button(
            parent, text=label, command=lambda: window._post(event)
        )


def Cancel(*args, **kw):
    return Button(*(args or ("Cancel",)), **kw)


class _BrowseButton(Element):
    """Base for FilesBrowse/FolderBrowse: opens a dialog and writes the
    result into the nearest preceding InputText of its row."""

    typename = "Button"
    _target: Optional[Element] = None

    def _browse(self):  # pragma: no cover - GUI
        raise NotImplementedError

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter.ttk as ttk

        label = self.args[0] if self.args else "Browse"
        self.widget = ttk.Button(parent, text=label, command=self._on_click)

    def _on_click(self):  # pragma: no cover - GUI
        got = self._browse()
        if got and self._target is not None:
            self._target.update(got)

    def _filetypes(self):
        ft = self.kw.get("file_types")
        return [tuple(t) for t in ft] if ft else [("All Files", "*.*")]


class FilesBrowse(_BrowseButton):
    def _browse(self):  # pragma: no cover - GUI
        from tkinter import filedialog

        names = filedialog.askopenfilenames(
            parent=self._window.TKroot, filetypes=self._filetypes()
        )
        return ";".join(names) if names else ""


class FolderBrowse(_BrowseButton):
    def _browse(self):  # pragma: no cover - GUI
        from tkinter import filedialog

        return filedialog.askdirectory(parent=self._window.TKroot) or ""


class Push(Element):
    typename = "Push"

    def _attach(self, parent, window, **pack_kw):  # pragma: no cover - GUI
        import tkinter as tk

        self._window = window
        self._holder = tk.Frame(parent)
        self._holder.pack(side="left", expand=True, fill="x")


class Image(Element):
    typename = "Image"

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk
        import tkinter.ttk as ttk

        self.widget = ttk.Label(parent)
        self._photo = None
        data = self.kw.get("data")
        if data:
            try:
                self._photo = tk.PhotoImage(master=parent, data=data)
                self.widget.config(image=self._photo)
            except tk.TclError:
                pass  # undecodable image: keep an empty label

    def update(self, *args, **kw):  # pragma: no cover - GUI
        import tkinter as tk

        data = kw.pop("data", None)
        if data is not None and self.widget is not None:
            try:
                self._photo = tk.PhotoImage(master=self.widget, data=data)
                self.widget.config(image=self._photo)
            except tk.TclError:
                pass
        super().update(*args, **kw)


class Canvas(Element):
    """Bare tk canvas; ``.TKCanvas`` is the embed point for matplotlib's
    FigureCanvasTkAgg (gui/analyser_window.py)."""

    typename = "Canvas"

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk

        w, h = self.kw.get("size", (400, 400))
        self.widget = tk.Canvas(parent, width=w, height=h)

    @property
    def TKCanvas(self):
        return self.widget


class Tab(Element):
    typename = "Tab"

    def __init__(self, title, layout, **kw):
        super().__init__(title, layout, **kw)
        self.title = title
        self.layout = layout
        self.frame = None


class TabGroup(Element):
    typename = "TabGroup"

    def __init__(self, layout, **kw):
        super().__init__(layout, **kw)
        self.tabs: List[Tab] = [t for row in layout for t in row]

    def _build(self, parent, window):  # pragma: no cover - GUI
        import tkinter as tk
        import tkinter.ttk as ttk

        self.widget = ttk.Notebook(parent)
        self._tab_by_path: Dict[str, Tab] = {}
        for tab in self.tabs:
            tab.frame = tk.Frame(self.widget)
            tab._window = window
            window._build_rows(tab.frame, tab.layout)
            self.widget.add(tab.frame, text=tab.title)
            self._tab_by_path[str(tab.frame)] = tab
        if self.kw.get("enable_events") and self.Key is not None:
            self.widget.bind(
                "<<NotebookTabChanged>>", lambda e: window._post(self.Key)
            )

    def get(self):
        """Value = the selected Tab's key (FreeSimpleGUI semantics)."""
        if self.widget is None:
            return self.tabs[0].Key if self.tabs else None
        tab = self._tab_by_path.get(self.widget.select())
        return tab.Key if tab is not None else None


class Window:
    def __init__(self, title, layout, finalize=False, resizable=False, **kw):
        import tkinter as tk

        self.Title = title
        self.elements: List[Element] = []
        self.AllKeysDict: Dict[object, Element] = {}
        root = _tk_root()
        self.TKroot = tk.Toplevel(root)
        self.TKroot.title(title)
        if resizable:
            self.TKroot.resizable(True, True)
        self._events: List[object] = []
        self._closed = False
        self._wait = tk.IntVar(master=root)
        self.TKroot.protocol("WM_DELETE_WINDOW", self._on_delete)
        self._build_rows(self.TKroot, layout)
        if finalize:
            self.TKroot.update_idletasks()
            self.TKroot.update()

    # -- layout ---------------------------------------------------------
    def _build_rows(self, parent, layout):
        import tkinter as tk

        for row in layout:
            frame = tk.Frame(parent)
            frame.pack(side="top", fill="x", padx=2, pady=1)
            for i, el in enumerate(row):
                if isinstance(el, _BrowseButton):
                    el._target = find_browse_target(row, i)
                el._attach(frame, self)
                self._register(el)

    def _register(self, el: Element):
        self.elements.append(el)
        if el.Key is not None:
            self.AllKeysDict[el.Key] = el
        if isinstance(el, TabGroup):
            for tab in el.tabs:
                if tab.Key is not None:
                    self.AllKeysDict[tab.Key] = tab
                # tab-body elements were registered by _build_rows already

    def __getitem__(self, key):
        return self.AllKeysDict[key]

    # -- event loop -----------------------------------------------------
    def _post(self, event):
        self._events.append(event)
        self._wait.set(self._wait.get() + 1)

    def _on_delete(self):
        self._closed = True
        try:
            self.TKroot.destroy()
        finally:
            self._wait.set(self._wait.get() + 1)

    def read(self, timeout=None):
        import tkinter as tk

        if self._closed:
            return WIN_CLOSED, None
        if not self._events:
            after_id = None
            if timeout is not None:
                after_id = self.TKroot.after(
                    max(int(timeout), 1), lambda: self._post(TIMEOUT_EVENT)
                )
            _tk_root().wait_variable(self._wait)
            if after_id is not None:
                try:
                    self.TKroot.after_cancel(after_id)
                except tk.TclError:
                    pass
        if self._closed:
            return WIN_CLOSED, None
        event = self._events.pop(0) if self._events else TIMEOUT_EVENT
        return event, self._values()

    def _values(self):
        return {
            el.Key: el.get()
            for el in self.elements
            if el.Key is not None and el.typename in _VALUE_TYPES
        }

    def finalize(self):
        self.TKroot.update_idletasks()
        return self

    def close(self):
        import tkinter as tk

        if not self._closed:
            self._closed = True
            try:
                self.TKroot.destroy()
            except tk.TclError:
                pass


def popup_ok(*args, **kw):  # pragma: no cover - GUI
    from tkinter import messagebox

    messagebox.showinfo(
        kw.get("title", ""), " ".join(str(a) for a in args),
        parent=_tk_root(),
    )


class _Meter:  # pragma: no cover - GUI
    def __init__(self, title, n):
        import tkinter as tk
        import tkinter.ttk as ttk

        self.cancelled = False
        self.top = tk.Toplevel(_tk_root())
        self.top.title(title)
        self.label = ttk.Label(self.top, text="")
        self.label.pack(padx=10, pady=4)
        self.bar = ttk.Progressbar(self.top, maximum=n, length=240)
        self.bar.pack(padx=10, pady=4)
        ttk.Button(self.top, text="Cancel", command=self._cancel).pack(pady=4)

    def _cancel(self):
        self.cancelled = True


_meters: Dict[str, "_Meter"] = {}


def one_line_progress_meter(title, current, total, *args, **kw):
    """Progress window keyed by title; True while running / completed,
    False once the user hit Cancel (reference meter semantics,
    Solex_recon.py:34-44)."""  # pragma: no cover - GUI
    import tkinter as tk

    m = _meters.get(title)
    if m is None:
        m = _meters[title] = _Meter(title, total)
    if m.cancelled:
        return False
    msg = " ".join(str(a) for a in args)
    try:
        m.bar["value"] = current
        m.label.config(text=f"{current}/{total} {msg}")
        m.top.update()
    except tk.TclError:  # user closed the meter window
        _meters.pop(title, None)
        return False
    if current >= total:
        try:
            m.top.destroy()
        except tk.TclError:
            pass
        _meters.pop(title, None)
    return True
