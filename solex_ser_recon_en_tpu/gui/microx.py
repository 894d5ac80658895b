"""MicroX — a minimal, pure-Python X11 display server for headless GUIs.

The reference application is a desktop GUI (FreeSimpleGUI/tkinter,
``/root/reference/UI_handler.py:169-311``); this framework ships a
tkinter backend (``gui/fsg_tk.py``) so the windows need no third-party
package — but a *display server* is still required for Tk to construct
and map windows, and none exists in CI-like images (no Xvfb/Xorg).

MicroX closes that gap: it implements enough of the X11 core protocol
(plus accept-level RENDER and BIG-REQUESTS stubs) for Tk 8.6 + Xft to
open a display, create/map windows, allocate colors, upload images,
receive events and run an event loop — entirely in-process, no native
code, no display hardware.  Drawing requests are rasterised into an
in-memory RGB framebuffer per top-level window (solid fills, copies and
image uploads; RENDER glyph composition renders real anti-aliased text
from the client-supplied alpha maps), so a *screenshot* of a mapped Tk
window can be captured headlessly via :meth:`MicroXServer.snapshot`.

This is NOT a full X server: one screen, TrueColor 24-bit only,
little-endian clients only (CPython on this platform), no server-side
fonts beyond a metrics stub (Tk uses client-side Xft/fontconfig
rendering), no extensions beyond the RENDER subset Xft needs.

Usage::

    with MicroXServer() as xs:          # picks a free display
        os.environ["DISPLAY"] = xs.display
        root = tkinter.Tk()             # really constructs
        ...

or standalone: ``python -m solex_ser_recon_en_tpu.gui.microx :9``.

Protocol layout follows the X Window System Protocol spec (X11R7.7);
request opcodes and reply structures are re-derived from the published
standard, not from any server implementation.
"""

from __future__ import annotations

import os
import select
import socket
import struct
import threading


# ---------------------------------------------------------------------------
# predefined atoms (X11 protocol, section "Predefined Atoms")

_PREDEFINED_ATOMS = [
    "PRIMARY", "SECONDARY", "ARC", "ATOM", "BITMAP", "CARDINAL", "COLORMAP",
    "CURSOR", "CUT_BUFFER0", "CUT_BUFFER1", "CUT_BUFFER2", "CUT_BUFFER3",
    "CUT_BUFFER4", "CUT_BUFFER5", "CUT_BUFFER6", "CUT_BUFFER7", "DRAWABLE",
    "FONT", "INTEGER", "PIXMAP", "POINT", "RECTANGLE", "RESOURCE_MANAGER",
    "RGB_COLOR_MAP", "RGB_BEST_MAP", "RGB_BLUE_MAP", "RGB_DEFAULT_MAP",
    "RGB_GRAY_MAP", "RGB_GREEN_MAP", "RGB_RED_MAP", "STRING", "VISUALID",
    "WINDOW", "WM_COMMAND", "WM_HINTS", "WM_CLIENT_MACHINE", "WM_ICON_NAME",
    "WM_ICON_SIZE", "WM_NAME", "WM_NORMAL_HINTS", "WM_SIZE_HINTS",
    "WM_ZOOM_HINTS", "MIN_SPACE", "NORM_SPACE", "MAX_SPACE", "END_SPACE",
    "SUPERSCRIPT_X", "SUPERSCRIPT_Y", "SUBSCRIPT_X", "SUBSCRIPT_Y",
    "UNDERLINE_POSITION", "UNDERLINE_THICKNESS", "STRIKEOUT_ASCENT",
    "STRIKEOUT_DESCENT", "ITALIC_ANGLE", "X_HEIGHT", "QUAD_WIDTH", "WEIGHT",
    "POINT_SIZE", "RESOLUTION", "COPYRIGHT", "NOTICE", "FONT_NAME",
    "FAMILY_NAME", "FULL_NAME", "CAP_HEIGHT", "WM_CLASS", "WM_TRANSIENT_FOR",
]

# a compact named-color table: the X names Tk's defaults and this
# framework's windows can reach (hex specs are parsed client-side and
# arrive as AllocColor, never by name); gray0-100 are generated below
_NAMED_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255),
    "gray": (190, 190, 190), "grey": (190, 190, 190),
    "darkgray": (169, 169, 169), "darkgrey": (169, 169, 169),
    "lightgray": (211, 211, 211), "lightgrey": (211, 211, 211),
    "darkgreen": (0, 100, 0), "darkred": (139, 0, 0),
    "darkblue": (0, 0, 139), "navy": (0, 0, 128),
    "orange": (255, 165, 0), "brown": (165, 42, 42),
    "pink": (255, 192, 203), "purple": (160, 32, 240),
    "lightblue": (173, 216, 230), "lightyellow": (255, 255, 224),
    "lightgreen": (144, 238, 144), "ivory": (255, 255, 240),
    "beige": (245, 245, 220), "khaki": (240, 230, 140),
    "gold": (255, 215, 0), "firebrick": (178, 34, 34),
    "royalblue": (65, 105, 225), "steelblue": (70, 130, 180),
    "dodgerblue": (30, 144, 255), "tomato": (255, 99, 71),
    "salmon": (250, 128, 114), "seagreen": (46, 139, 87),
    "forestgreen": (34, 139, 34), "limegreen": (50, 205, 50),
    "slategray": (112, 128, 144), "slategrey": (112, 128, 144),
    "dimgray": (105, 105, 105), "dimgrey": (105, 105, 105),
    "gainsboro": (220, 220, 220), "whitesmoke": (245, 245, 245),
    "snow": (255, 250, 250), "linen": (250, 240, 230),
    "antiquewhite": (250, 235, 215),
}
for _i in range(101):
    _v = round(_i * 255 / 100)
    _NAMED_COLORS[f"gray{_i}"] = (_v, _v, _v)
    _NAMED_COLORS[f"grey{_i}"] = (_v, _v, _v)


def _pad4(n: int) -> int:
    return (4 - (n & 3)) & 3


def wait_for_line(proc, token: str, timeout_s: float = 60.0) -> bool:
    """Bounded wait for ``token`` in a subprocess's stdout lines.

    Returns True when seen, False on timeout or child exit.  A bare
    ``readline()`` would defeat any timeout when the child wedges before
    printing anything — the read is select-bounded instead."""
    import time

    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        ready, _, _ = select.select([proc.stdout], [], [], 0.5)
        if not ready:
            if proc.poll() is not None:
                return False
            continue
        line = proc.stdout.readline()
        if token in line:
            return True
        if not line and proc.poll() is not None:
            return False
    return False


def _socket_alive(path: str, timeout: float = 1.0) -> bool:
    """True when something accepts connections on the unix socket."""
    probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    probe.settimeout(timeout)
    try:
        probe.connect(path)
        return True
    except OSError:
        return False
    finally:
        probe.close()


class _Window:
    __slots__ = ("wid", "parent", "x", "y", "w", "h", "border", "depth",
                 "cls", "event_mask", "mapped", "props", "attrs", "children",
                 "override", "fb")

    def __init__(self, wid, parent, x, y, w, h, border, depth, cls):
        self.wid = wid
        self.parent = parent
        self.x, self.y, self.w, self.h = x, y, w, h
        self.border = border
        self.depth = depth
        self.cls = cls                      # 1 InputOutput / 2 InputOnly
        self.event_mask = 0
        self.mapped = False
        self.props = {}                     # atom -> (type, format, bytes)
        self.attrs = {}
        self.children = []
        self.override = False
        self.fb = None                      # numpy (h, w, 3) for top-levels


class _Pixmap:
    __slots__ = ("pid", "drawable", "w", "h", "depth", "fb")

    def __init__(self, pid, drawable, w, h, depth):
        self.pid = pid
        self.drawable = drawable
        self.w, self.h, self.depth = w, h, depth
        self.fb = None


class _GC:
    __slots__ = ("values",)

    _DEFAULTS = {
        "function": 3, "foreground": 0, "background": 1, "line_width": 0,
        "font": 0, "graphics_exposures": 1, "clip_x": 0, "clip_y": 0,
    }

    def __init__(self):
        self.values = dict(self._DEFAULTS)


# GC value-list keys in X protocol bit order (CreateGC/ChangeGC bitmask)
_GC_KEYS = [
    "function", "plane_mask", "foreground", "background", "line_width",
    "line_style", "cap_style", "join_style", "fill_style", "fill_rule",
    "tile", "stipple", "ts_x", "ts_y", "font", "subwindow_mode",
    "graphics_exposures", "clip_x", "clip_y", "clip_mask", "dash_offset",
    "dashes", "arc_mode",
]

# CreateWindow / ChangeWindowAttributes value-list keys in bit order
_WINATTR_KEYS = [
    "background_pixmap", "background_pixel", "border_pixmap", "border_pixel",
    "bit_gravity", "win_gravity", "backing_store", "backing_planes",
    "backing_pixel", "override_redirect", "save_under", "event_mask",
    "do_not_propagate_mask", "colormap", "cursor",
]

# ConfigureWindow value keys in bit order
_CONFIG_KEYS = ["x", "y", "width", "height", "border_width", "sibling",
                "stack_mode"]

# event mask bits
_KEY_PRESS_MASK = 1 << 0
_EXPOSURE_MASK = 1 << 15
_VISIBILITY_MASK = 1 << 16
_STRUCTURE_MASK = 1 << 17
_SUBSTRUCTURE_NOTIFY_MASK = 1 << 19
_PROPERTY_MASK = 1 << 22


class _Client:
    def __init__(self, sock, server, rid_base):
        self.sock = sock
        self.server = server
        self.rid_base = rid_base
        self.seq = 0
        self.buf = b""
        self.setup_done = False
        self.out = b""

    def queue(self, data: bytes) -> None:
        self.out += data

    def flush(self) -> None:
        if not self.out:
            return
        try:
            self.sock.sendall(self.out)
        except OSError:
            pass
        self.out = b""


class MicroXServer:
    """A tiny in-process X display server sufficient for Tk 8.6 + Xft."""

    RENDER_OPCODE = 130          # extension major opcode we advertise

    def __init__(self, display: int | None = None, width: int = 1600,
                 height: int = 1200, log: bool = False):
        self.width, self.height = width, height
        self._log = log
        self._display_num = display
        self._sock = None
        self._thread = None
        self._stop_r, self._stop_w = None, None
        self._sock_path = None
        self._lock = threading.RLock()  # reentrant: handlers emit events
        self._reset_state()

    # -- lifecycle ---------------------------------------------------------

    def _reset_state(self):
        self.atoms = {name: i + 1 for i, name in enumerate(_PREDEFINED_ATOMS)}
        self.atom_names = {i + 1: name for i, name in
                           enumerate(_PREDEFINED_ATOMS)}
        self.next_atom = len(_PREDEFINED_ATOMS) + 1
        self.root_id = 0x200
        self.default_colormap = 0x201
        self.root_visual = 0x21
        root = _Window(self.root_id, 0, 0, 0, self.width, self.height, 0,
                       24, 1)
        root.mapped = True
        # RESOURCE_MANAGER empty: Tk falls back to built-in defaults
        self.windows = {self.root_id: root}
        self.pixmaps = {}
        self.gcs = {}
        self.fonts = set()
        self.cursors = set()
        self.colormaps = {self.default_colormap}
        self.glyphsets = {}                  # gsid -> {glyph: (w,h,x,y,alpha)}
        self.pictures = {}                   # pid -> drawable id
        self.selections = {}
        self.clients = []

    def start(self) -> "MicroXServer":
        os.makedirs("/tmp/.X11-unix", exist_ok=True)
        n = self._display_num
        if n is None:
            for cand in range(77, 200):
                if not os.path.exists(f"/tmp/.X11-unix/X{cand}"):
                    n = cand
                    break
        self._display_num = n
        self._sock_path = f"/tmp/.X11-unix/X{n}"
        if os.path.exists(self._sock_path):
            # only reclaim a STALE socket — stealing a live display would
            # kill its clients (Xlib's XIO handler exits the process)
            if _socket_alive(self._sock_path):
                raise RuntimeError(
                    f"display :{n} is in use by a live server")
            os.unlink(self._sock_path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(self._sock_path)
        self._sock.listen(8)
        self._stop_r, self._stop_w = os.pipe()
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name=f"microx:{n}")
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._stop_w is not None:
            try:
                os.write(self._stop_w, b"x")
            except OSError:
                pass
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        for fd in (self._stop_r, self._stop_w):
            if fd is not None:
                try:
                    os.close(fd)
                except OSError:
                    pass
        self._stop_r = self._stop_w = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None
        if self._sock_path:
            try:
                os.unlink(self._sock_path)
            except OSError:
                pass

    @property
    def display(self) -> str:
        return f":{self._display_num}"

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @staticmethod
    def spawn(display: int | None = None, timeout: float = 60.0):
        """Start MicroX in a SUBPROCESS and return a handle.

        tkinter clients in *this* process must talk to an out-of-process
        server: ``_tkinter.create`` blocks on the X socket while holding
        the GIL, so an in-process (thread) server can never get scheduled
        to reply — a guaranteed deadlock.  The subprocess runs this module
        standalone (no package import, so no JAX initialisation).

        Returns an object with ``.display``, ``.stop()`` and context-
        manager support.
        """
        import subprocess
        import sys
        import time

        os.makedirs("/tmp/.X11-unix", exist_ok=True)

        def _free_displays():
            for cand in range(77, 200):
                path = f"/tmp/.X11-unix/X{cand}"
                if not os.path.exists(path):
                    yield cand
                elif not _socket_alive(path):
                    # stale socket from a killed server: reclaimable
                    try:
                        os.unlink(path)
                    except OSError:
                        continue
                    yield cand

        if display is not None:
            candidates = [display]
        else:
            candidates = []
            for cand in _free_displays():
                candidates.append(cand)
                if len(candidates) >= 5:
                    break
            if not candidates:
                raise RuntimeError("no free display number in :77..:199")
        # the server needs only the stdlib (+ lazy numpy): strip any
        # accelerator-preloading site dirs from the child's PYTHONPATH so
        # startup is instant even when an accelerator tunnel is down/slow
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p)

        def _die_with_parent():  # pragma: no cover - runs in the child
            try:
                import ctypes

                # PR_SET_PDEATHSIG=1, SIGTERM=15: the server must never
                # outlive its client process — a killed test run would
                # otherwise leak a listener AND leave Tk clients racing
                # a half-dead display
                ctypes.CDLL("libc.so.6").prctl(1, 15)
            except Exception:
                pass

        proc = None
        path = None
        for cand in candidates:
            # two concurrent spawns can race to the same free number;
            # the loser's child refuses the live display and exits, and
            # the loop moves on to the next candidate
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), f":{cand}"],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, preexec_fn=_die_with_parent)
            path = f"/tmp/.X11-unix/X{cand}"
            t0 = time.monotonic()
            while (not os.path.exists(path) or proc.poll() is not None):
                if proc.poll() is not None:
                    proc = None
                    break
                if time.monotonic() - t0 > timeout:
                    proc.kill()
                    raise RuntimeError("microx subprocess failed to start")
                time.sleep(0.05)
            if proc is not None:
                display = cand
                break
        if proc is None:
            raise RuntimeError("microx subprocess failed to start on "
                               f"candidates {candidates}")

        class _Handle:
            def __init__(self, proc, display):
                self.proc = proc
                self.display = f":{display}"

            def stop(self):
                self.proc.terminate()
                try:
                    self.proc.wait(timeout=5)
                except Exception:
                    self.proc.kill()
                try:
                    os.unlink(path)
                except OSError:
                    pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.stop()

        return _Handle(proc, display)

    # -- main loop ---------------------------------------------------------

    def _serve(self):
        clients = {}
        rid_next = 0x00400000
        while True:
            socks = [self._sock, self._stop_r] + list(clients)
            try:
                readable, _, _ = select.select(socks, [], [])
            except OSError:
                break
            if self._stop_r in readable:
                break
            for s in readable:
                if s is self._sock:
                    conn, _ = self._sock.accept()
                    conn.setblocking(True)
                    c = _Client(conn, self, rid_next)
                    rid_next += 0x00200000
                    clients[conn] = c
                    with self._lock:
                        self.clients.append(c)
                    continue
                c = clients.get(s)
                if c is None:
                    continue
                try:
                    data = s.recv(1 << 16)
                except OSError:
                    data = b""
                if not data:
                    with self._lock:
                        if c in self.clients:
                            self.clients.remove(c)
                    del clients[s]
                    s.close()
                    continue
                c.buf += data
                try:
                    # the state lock serialises request handling against
                    # snapshot() readers on other threads
                    with self._lock:
                        self._drain(c)
                except Exception as e:      # pragma: no cover - diagnostics
                    if self._log:
                        import traceback

                        traceback.print_exc()
                        print("microx: client error", e, flush=True)
                c.flush()
        for s in clients:
            s.close()

    def _drain(self, c: _Client) -> None:
        while True:
            if not c.setup_done:
                if len(c.buf) < 12:
                    return
                order, _, _maj, _min, nauth, ndata, _ = struct.unpack(
                    "<BBHHHHH", c.buf[:12])
                need = 12 + nauth + _pad4(nauth) + ndata + _pad4(ndata)
                if len(c.buf) < need:
                    return
                c.buf = c.buf[need:]
                c.queue(self._setup_reply(c))
                c.setup_done = True
                continue
            if len(c.buf) < 4:
                return
            opcode, data, length = struct.unpack("<BBH", c.buf[:4])
            nbytes = length * 4
            if length == 0:
                # BIG-REQUESTS extended length (we advertise the extension
                # because xcb prefers it when present)
                if len(c.buf) < 8:
                    return
                nbytes = struct.unpack("<I", c.buf[4:8])[0] * 4
            if len(c.buf) < nbytes or nbytes < 4:
                if nbytes < 4:      # malformed; drop connection state
                    c.buf = b""
                return
            req = c.buf[4:nbytes] if length != 0 else c.buf[8:nbytes]
            c.buf = c.buf[nbytes:]
            c.seq = (c.seq + 1) & 0xFFFF
            self._dispatch(c, opcode, data, req)

    # -- wire helpers ------------------------------------------------------

    def _setup_reply(self, c: _Client) -> bytes:
        vendor = b"microx (solex_ser_recon_en_tpu)"
        vpad = _pad4(len(vendor))
        # formats: depth 1, 24, 32
        formats = b""
        for depth, bpp in ((1, 1), (24, 32), (32, 32)):
            formats += struct.pack("<BBB5x", depth, bpp, 32)
        visual = struct.pack("<IBBHIII4x", self.root_visual, 4, 8, 256,
                             0xFF0000, 0x00FF00, 0x0000FF)
        depth24 = struct.pack("<BxH4x", 24, 1) + visual
        depth1 = struct.pack("<BxH4x", 1, 0)
        depths = depth24 + depth1
        screen = struct.pack(
            "<IIIIIHHHHHHIBBBB",
            self.root_id, self.default_colormap, 0xFFFFFF, 0x000000,
            0,                                   # current input masks
            self.width, self.height,
            self.width * 254 // 960, self.height * 254 // 960,
            1, 1, self.root_visual,
            0, 0, 24, 2) + depths
        extra = struct.pack(
            "<IIIIHHBBBBBBBB4x",
            11 << 16,                            # release number
            c.rid_base, 0x001FFFFF,              # resource id base/mask
            256 * 1024,                          # motion buffer
            len(vendor), 0xFFFF,                 # vendor len, max req len
            1, 3,                                # screens, formats
            0, 0, 32, 32,                        # LSB, LSB, unit, pad
            8, 255,                              # min/max keycode
        ) + vendor + b"\0" * vpad + formats + screen
        return struct.pack("<BxHHH", 1, 11, 0, len(extra) // 4) + extra

    def _reply(self, c: _Client, data_byte: int = 0, body: bytes = b"",
               fixed: bytes = b"") -> None:
        """Send a reply: ``fixed`` fills the 24 fixed bytes after the
        8-byte header; ``body`` is the variable part (padded here)."""
        fixed = fixed.ljust(24, b"\0")
        body = body + b"\0" * _pad4(len(body))
        c.queue(struct.pack("<BBHI", 1, data_byte & 0xFF, c.seq,
                            len(body) // 4) + fixed + body)

    def _reply_raw(self, c: _Client, data_byte: int, payload: bytes) -> None:
        """Reply whose structured fields cross the 32-byte boundary
        (QueryFont, GetKeyboardControl): ``payload`` is the full contents
        after the 8-byte header, laid out contiguously."""
        payload = payload.ljust(24, b"\0")
        payload = payload + b"\0" * _pad4(len(payload))
        c.queue(struct.pack("<BBHI", 1, data_byte & 0xFF, c.seq,
                            (len(payload) - 24) // 4) + payload)

    def _error(self, c: _Client, code: int, major: int, bad: int = 0,
               minor: int = 0) -> None:
        c.queue(struct.pack("<BBHIHB21x", 0, code, c.seq, bad, minor, major))

    def _event(self, code: int, payload: bytes, mask_window: _Window | None,
               mask: int | None) -> None:
        """Queue a 32-byte event to every client (filtered by window mask
        when given).  payload starts at byte 4 (after code/detail/seq)."""
        if mask_window is not None and mask is not None:
            if not (mask_window.event_mask & mask):
                return
        with self._lock:
            clients = list(self.clients)
        for c in clients:
            ev = struct.pack("<BBH", code, 0, c.seq) + payload
            c.queue(ev.ljust(32, b"\0"))
            c.flush()

    # -- framebuffer helpers -------------------------------------------------

    def _toplevel(self, wid: int):
        """Walk up to the top-level (child-of-root) window, tracking the
        offset of ``wid`` within it."""
        ox = oy = 0
        w = self.windows.get(wid)
        while w is not None and w.parent not in (0, self.root_id):
            ox += w.x
            oy += w.y
            w = self.windows.get(w.parent)
        return w, ox, oy

    def _drawable_fb(self, did: int):
        """(numpy fb, off_x, off_y) for a drawable, creating lazily."""
        import numpy as np

        if did in self.pixmaps:
            p = self.pixmaps[did]
            if p.fb is None:
                p.fb = np.zeros((max(p.h, 1), max(p.w, 1), 3), np.uint8)
            return p.fb, 0, 0
        top, ox, oy = self._toplevel(did)
        if top is None or top.wid == self.root_id:
            return None, 0, 0
        if top.fb is None or top.fb.shape[:2] != (top.h, top.w):
            fb = np.full((max(top.h, 1), max(top.w, 1), 3), 217, np.uint8)
            if top.fb is not None:
                # a resize must preserve existing content (real servers
                # keep window pixels; only newly exposed areas repaint)
                h = min(fb.shape[0], top.fb.shape[0])
                w = min(fb.shape[1], top.fb.shape[1])
                fb[:h, :w] = top.fb[:h, :w]
            top.fb = fb
        return top.fb, ox, oy

    def _child_guard(self, did: int, fb, ox: int, oy: int):
        """Saved copies of mapped InputOutput children's pixel rects.

        X11 semantics: child windows CLIP all drawing into their parent —
        a background fill on a toplevel must not touch widget pixels.
        This flat-framebuffer server approximates that by snapshotting the
        children's rects before a parent draw and restoring them after
        (see ``_restore_children``)."""
        win = self.windows.get(did)
        if win is None or not win.children:
            return ()
        fh, fw = fb.shape[:2]
        saved = []
        for kid_id in win.children:
            kid = self.windows.get(kid_id)
            if kid is None or not kid.mapped or kid.cls == 2:
                continue
            x0, y0 = max(kid.x + ox, 0), max(kid.y + oy, 0)
            x1 = min(kid.x + ox + kid.w + 2 * kid.border, fw)
            y1 = min(kid.y + oy + kid.h + 2 * kid.border, fh)
            if x1 > x0 and y1 > y0:
                saved.append((y0, y1, x0, x1, fb[y0:y1, x0:x1].copy()))
        return saved

    @staticmethod
    def _restore_children(fb, saved) -> None:
        for y0, y1, x0, x1, patch in saved:
            fb[y0:y1, x0:x1] = patch

    @staticmethod
    def _fill_rect(fb, x, y, w, h, pixel):
        fh, fw = fb.shape[:2]
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, fw), min(y + h, fh)
        if x1 > x0 and y1 > y0:
            fb[y0:y1, x0:x1, 0] = (pixel >> 16) & 0xFF
            fb[y0:y1, x0:x1, 1] = (pixel >> 8) & 0xFF
            fb[y0:y1, x0:x1, 2] = pixel & 0xFF

    def snapshot(self, wid: int | None = None):
        """RGB uint8 array of a mapped top-level window's framebuffer (the
        first mapped one when ``wid`` is None); None if nothing rendered."""
        with self._lock:
            wins = list(self.windows.values())
        cands = [w for w in wins
                 if w.fb is not None and (wid is None or w.wid == wid)]
        if not cands:
            return None
        return max(cands, key=lambda w: w.w * w.h).fb.copy()

    # -- request dispatch ----------------------------------------------------

    def _dispatch(self, c: _Client, opcode: int, data: int, req: bytes):
        h = _HANDLERS.get(opcode)
        if h is not None:
            h(self, c, data, req)
            return
        if opcode == self.RENDER_OPCODE:
            self._render_dispatch(c, data, req)
            return
        if opcode == self.BIGREQ_OPCODE:
            # BigReqEnable: reply with max request length (in 4-byte units)
            self._reply(c, fixed=struct.pack("<I", 4 * 1024 * 1024))
            return
        if self._log:
            print(f"microx: unhandled opcode {opcode} (data={data}, "
                  f"len={len(req)})", flush=True)
        # Unknown core request: X returns a Request error
        self._error(c, 1, opcode)

    BIGREQ_OPCODE = 133

    # individual handlers --------------------------------------------------

    def _h_create_window(self, c, depth, req):
        wid, parent, x, y, w, h, border, cls, _visual, mask = struct.unpack(
            "<IIhhHHHHII", req[:28])
        win = _Window(wid, parent, x, y, w, h, border, depth or 24, cls or 1)
        vals = struct.unpack(f"<{mask.bit_count()}I",
                             req[28:28 + 4 * mask.bit_count()])
        vi = 0
        for bit, key in enumerate(_WINATTR_KEYS):
            if mask & (1 << bit):
                win.attrs[key] = vals[vi]
                if key == "event_mask":
                    win.event_mask = vals[vi]
                if key == "override_redirect":
                    win.override = bool(vals[vi])
                vi += 1
        self.windows[wid] = win
        p = self.windows.get(parent)
        if p is not None:
            p.children.append(wid)

    def _h_change_attrs(self, c, data, req):
        wid, mask = struct.unpack("<II", req[:8])
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 2, wid)
        vals = struct.unpack(f"<{mask.bit_count()}I",
                             req[8:8 + 4 * mask.bit_count()])
        vi = 0
        for bit, key in enumerate(_WINATTR_KEYS):
            if mask & (1 << bit):
                win.attrs[key] = vals[vi]
                if key == "event_mask":
                    win.event_mask = vals[vi]
                if key == "override_redirect":
                    win.override = bool(vals[vi])
                vi += 1

    def _h_get_attrs(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 3, wid)
        map_state = 2 if win.mapped else 0
        body = struct.pack("<IHBBIIBBBBIIIH2x",
                           self.root_visual, win.cls, 0, 1, 0, 0, 0, 1,
                           map_state, 1 if win.override else 0,
                           self.default_colormap, win.event_mask,
                           win.event_mask, 0)
        # GetWindowAttributes reply: 3 extra 4-byte units beyond fixed part
        self._reply(c, data_byte=0, fixed=body[:24], body=body[24:])

    def _h_destroy_window(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.pop(wid, None)
        if win is not None:
            for kid in list(win.children):
                self._h_destroy_window(c, data, struct.pack("<I", kid))
            p = self.windows.get(win.parent)
            if p is not None and wid in p.children:
                p.children.remove(wid)
            payload = struct.pack("<II", wid, wid)
            self._event(17, payload, win, _STRUCTURE_MASK)  # DestroyNotify

    def _h_destroy_subwindows(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is not None:
            for kid in list(win.children):
                self._h_destroy_window(c, data, struct.pack("<I", kid))

    def _h_map_subwindows(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is not None:
            for kid in list(win.children):
                self._h_map_window(c, data, struct.pack("<I", kid))

    def _h_unmap_subwindows(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is not None:
            for kid in list(win.children):
                self._h_unmap_window(c, data, struct.pack("<I", kid))

    def _h_map_window(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 8, wid)
        win.mapped = True
        override = 1 if win.override else 0
        # MapNotify to the window (StructureNotify) and parent
        payload = struct.pack("<IIB", wid, wid, override)
        self._event(19, payload, win, _STRUCTURE_MASK)
        parent = self.windows.get(win.parent)
        if parent is not None:
            self._event(19, struct.pack("<IIB", win.parent, wid, override),
                        parent, _SUBSTRUCTURE_NOTIFY_MASK)
        # VisibilityNotify (unobscured), then Expose
        self._event(15, struct.pack("<IB", wid, 0), win, _VISIBILITY_MASK)
        self._event(12, struct.pack("<IHHHHH", wid, 0, 0, win.w, win.h, 0),
                    win, _EXPOSURE_MASK)

    def _h_unmap_window(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is None:
            return
        win.mapped = False
        self._event(18, struct.pack("<IIB", wid, wid, 0), win,
                    _STRUCTURE_MASK)  # UnmapNotify

    def _h_configure_window(self, c, data, req):
        wid, mask = struct.unpack("<IH2x", req[:8])
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 12, wid)
        vals = struct.unpack(f"<{mask.bit_count()}I",
                             req[8:8 + 4 * mask.bit_count()])
        vi = 0
        for bit, key in enumerate(_CONFIG_KEYS):
            if mask & (1 << bit):
                v = vals[vi]
                vi += 1
                if key == "x":
                    win.x = struct.unpack("<i", struct.pack("<I", v))[0]
                elif key == "y":
                    win.y = struct.unpack("<i", struct.pack("<I", v))[0]
                elif key == "width" and v:
                    win.w = v
                elif key == "height" and v:
                    win.h = v
                elif key == "border_width":
                    win.border = v
        payload = struct.pack("<IIIhhHHHB", wid, wid, 0, win.x, win.y,
                              win.w, win.h, win.border,
                              1 if win.override else 0)
        self._event(22, payload, win, _STRUCTURE_MASK)  # ConfigureNotify
        if win.mapped and (mask & 0b1111):  # x/y/width/height changed
            # this server keeps pixels only at absolute toplevel
            # coordinates, so a moved or resized window must repaint
            # (real servers expose resized areas; moves carry content,
            # which we approximate by a full expose)
            self._event(12, struct.pack("<IHHHHH", wid, 0, 0, win.w,
                                        win.h, 0), win, _EXPOSURE_MASK)

    def _h_get_geometry(self, c, data, req):
        did = struct.unpack("<I", req[:4])[0]
        if did in self.pixmaps:
            p = self.pixmaps[did]
            fixed = struct.pack("<IhhHHH", self.root_id, 0, 0, p.w, p.h, 0)
            return self._reply(c, data_byte=p.depth, fixed=fixed)
        win = self.windows.get(did)
        if win is None:
            return self._error(c, 9, 14, did)
        fixed = struct.pack("<IhhHHH", self.root_id, win.x, win.y, win.w,
                            win.h, win.border)
        self._reply(c, data_byte=win.depth, fixed=fixed)

    def _h_query_tree(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 15, wid)
        kids = [k for k in win.children if k in self.windows]
        fixed = struct.pack("<IIH", self.root_id, win.parent, len(kids))
        self._reply(c, fixed=fixed, body=struct.pack(f"<{len(kids)}I", *kids))

    def _h_intern_atom(self, c, only_if_exists, req):
        (nlen,) = struct.unpack("<H2x", req[:4])
        name = req[4:4 + nlen].decode("latin-1")
        atom = self.atoms.get(name, 0)
        if atom == 0 and not only_if_exists:
            atom = self.next_atom
            self.next_atom += 1
            self.atoms[name] = atom
            self.atom_names[atom] = name
        self._reply(c, fixed=struct.pack("<I", atom))

    def _h_get_atom_name(self, c, data, req):
        atom = struct.unpack("<I", req[:4])[0]
        name = self.atom_names.get(atom)
        if name is None:
            return self._error(c, 5, 17, atom)
        nb = name.encode("latin-1")
        self._reply(c, fixed=struct.pack("<H", len(nb)), body=nb)

    def _h_change_property(self, c, mode, req):
        wid, prop, ptype, fmt, nunits = struct.unpack("<IIIB3xI", req[:20])
        nbytes = nunits * (fmt // 8)
        value = req[20:20 + nbytes]
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 18, wid)
        if mode != 0 and prop in win.props:      # prepend/append
            old_t, old_f, old_v = win.props[prop]
            value = old_v + value if mode == 2 else value + old_v
        win.props[prop] = (ptype, fmt, value)
        payload = struct.pack("<IIIB", wid, prop, 0, 0)  # PropertyNotify
        self._event(28, payload, win, _PROPERTY_MASK)

    def _h_delete_property(self, c, data, req):
        wid, prop = struct.unpack("<II", req[:8])
        win = self.windows.get(wid)
        if win is not None:
            win.props.pop(prop, None)

    def _h_list_properties(self, c, data, req):
        wid = struct.unpack("<I", req[:4])[0]
        win = self.windows.get(wid)
        props = list(win.props) if win else []
        self._reply(c, fixed=struct.pack("<H", len(props)),
                    body=struct.pack(f"<{len(props)}I", *props))

    def _h_get_property(self, c, delete, req):
        wid, prop, _ptype, off, maxlen = struct.unpack("<IIIII", req[:20])
        win = self.windows.get(wid)
        if win is None:
            return self._error(c, 3, 20, wid)
        entry = win.props.get(prop)
        if entry is None:
            return self._reply(c, data_byte=0,
                               fixed=struct.pack("<III", 0, 0, 0))
        ptype, fmt, value = entry
        unit = max(fmt // 8, 1)
        start = off * 4
        chunk = value[start:start + maxlen * 4]
        after = len(value) - start - len(chunk)
        if delete and after == 0:
            win.props.pop(prop, None)
        self._reply(c, data_byte=fmt,
                    fixed=struct.pack("<III", ptype, max(after, 0),
                                      len(chunk) // unit),
                    body=chunk)

    def _h_get_selection_owner(self, c, data, req):
        sel = struct.unpack("<I", req[:4])[0]
        self._reply(c, fixed=struct.pack("<I", self.selections.get(sel, 0)))

    def _h_set_selection_owner(self, c, data, req):
        owner, sel, _t = struct.unpack("<III", req[:12])
        self.selections[sel] = owner

    def _h_convert_selection(self, c, data, req):
        requestor, sel, target, prop, t = struct.unpack("<IIIII", req[:20])
        # no owner: SelectionNotify with property None (per spec)
        payload = struct.pack("<IIIII", t, requestor, sel, target, 0)
        win = self.windows.get(requestor)
        if win is not None:
            self._event(31, payload, None, None)

    def _h_send_event(self, c, propagate, req):
        dest, _mask = struct.unpack("<II", req[:8])
        ev = req[8:40]
        if dest in self.windows:
            with self._lock:
                clients = list(self.clients)
            for cl in clients:
                # rewrite sequence; set the send-event flag (top bit)
                cl.queue(bytes([ev[0] | 0x80]) + ev[1:2]
                         + struct.pack("<H", cl.seq) + ev[4:])
                cl.flush()

    def _h_grab_pointer(self, c, data, req):
        self._reply(c, data_byte=0)      # Success

    def _h_ungrab(self, c, data, req):
        pass

    def _h_grab_keyboard(self, c, data, req):
        self._reply(c, data_byte=0)

    def _h_grab_server(self, c, data, req):
        pass

    def _h_query_pointer(self, c, data, req):
        fixed = struct.pack("<IIhhhhH", self.root_id, 0, 0, 0, 0, 0, 0)
        self._reply(c, data_byte=1, fixed=fixed)

    def _h_get_motion_events(self, c, data, req):
        self._reply(c, fixed=struct.pack("<I", 0))

    def _h_translate_coords(self, c, data, req):
        src, dst, sx, sy = struct.unpack("<IIhh", req[:12])
        ax, ay = sx, sy
        w = self.windows.get(src)
        while w is not None and w.wid != self.root_id:
            ax += w.x
            ay += w.y
            w = self.windows.get(w.parent)
        w = self.windows.get(dst)
        path = []
        while w is not None and w.wid != self.root_id:
            path.append(w)
            w = self.windows.get(w.parent)
        for win in path:
            ax -= win.x
            ay -= win.y
        self._reply(c, data_byte=1, fixed=struct.pack("<Ihh", 0, ax, ay))

    def _h_warp_pointer(self, c, data, req):
        pass

    def _h_set_input_focus(self, c, data, req):
        pass

    def _h_get_input_focus(self, c, data, req):
        self._reply(c, data_byte=0, fixed=struct.pack("<I", self.root_id))

    def _h_query_keymap(self, c, data, req):
        self._reply(c, body=b"\0" * 32)

    def _h_open_font(self, c, data, req):
        fid = struct.unpack("<I", req[:4])[0]
        self.fonts.add(fid)

    def _h_close_font(self, c, data, req):
        self.fonts.discard(struct.unpack("<I", req[:4])[0])

    def _h_query_font(self, c, data, req):
        # minimal uniform-metrics font: per-char array empty, so clients
        # use min==max bounds for every glyph (X11 QueryFont semantics)
        char = struct.pack("<hhhhhH", 0, 6, 6, 10, 2, 0)   # one XCHARINFO
        payload = (char + b"\0" * 4 + char + b"\0" * 4
                   + struct.pack("<HHHHBBBBhhI", 32, 126, 32, 0,
                                 0, 0, 0, 1, 10, 2, 0))
        self._reply_raw(c, 0, payload)

    def _h_query_text_extents(self, c, odd_len, req):
        nchars = max((len(req) - 4) // 2, 0) - (1 if odd_len else 0)
        w = 6 * nchars
        fixed = struct.pack("<hhhhiii", 10, 2, 10, 2, w, 0, w)
        self._reply(c, data_byte=0, fixed=fixed)

    def _h_list_fonts_with_info(self, c, data, req):
        # immediately send the series terminator (zero-length name)
        self._reply_raw(c, 0, b"\0" * 52)

    def _h_list_fonts(self, c, data, req):
        name = b"fixed"
        self._reply(c, fixed=struct.pack("<H", 1),
                    body=bytes([len(name)]) + name)

    def _h_create_pixmap(self, c, depth, req):
        pid, drawable, w, h = struct.unpack("<IIHH", req[:12])
        self.pixmaps[pid] = _Pixmap(pid, drawable, w, h, depth)

    def _h_free_pixmap(self, c, data, req):
        self.pixmaps.pop(struct.unpack("<I", req[:4])[0], None)

    def _h_create_gc(self, c, data, req):
        gid, _drawable, mask = struct.unpack("<III", req[:12])
        gc = _GC()
        vals = struct.unpack(f"<{mask.bit_count()}I",
                             req[12:12 + 4 * mask.bit_count()])
        vi = 0
        for bit, key in enumerate(_GC_KEYS):
            if mask & (1 << bit):
                gc.values[key] = vals[vi]
                vi += 1
        self.gcs[gid] = gc

    def _h_change_gc(self, c, data, req):
        gid, mask = struct.unpack("<II", req[:8])
        gc = self.gcs.get(gid)
        if gc is None:
            return self._error(c, 13, 56, gid)
        vals = struct.unpack(f"<{mask.bit_count()}I",
                             req[8:8 + 4 * mask.bit_count()])
        vi = 0
        for bit, key in enumerate(_GC_KEYS):
            if mask & (1 << bit):
                gc.values[key] = vals[vi]
                vi += 1

    def _h_copy_gc(self, c, data, req):
        src, dst, _mask = struct.unpack("<III", req[:12])
        if src in self.gcs:
            self.gcs.setdefault(dst, _GC()).values.update(
                self.gcs[src].values)

    def _h_set_clip_rects(self, c, data, req):
        pass

    def _h_free_gc(self, c, data, req):
        self.gcs.pop(struct.unpack("<I", req[:4])[0], None)

    def _h_set_dashes(self, c, data, req):
        pass

    def _h_clear_area(self, c, data, req):
        wid, x, y, w, h = struct.unpack("<IhhHH", req[:12])
        win = self.windows.get(wid)
        if win is None:
            return
        fb, ox, oy = self._drawable_fb(wid)
        if fb is not None:
            bg = win.attrs.get("background_pixel", 0xD9D9D9)
            saved = self._child_guard(wid, fb, ox, oy)
            # X11: zero width/height mean "to the right/bottom edge"
            self._fill_rect(fb, ox + x, oy + y,
                            w or max(win.w - x, 0),
                            h or max(win.h - y, 0), bg)
            self._restore_children(fb, saved)

    def _h_copy_area(self, c, data, req):
        src, dst, gid, sx, sy, dx, dy, w, h = struct.unpack(
            "<IIIhhhhHH", req[:24])
        sfb, sox, soy = self._drawable_fb(src)
        dfb, dox, doy = self._drawable_fb(dst)
        if sfb is not None and dfb is not None:
            import numpy as np

            sh, sw = sfb.shape[:2]
            dh, dw = dfb.shape[:2]
            x0, y0 = max(sx + sox, 0), max(sy + soy, 0)
            x1, y1 = min(sx + sox + w, sw), min(sy + soy + h, sh)
            if x1 > x0 and y1 > y0:
                tile = sfb[y0:y1, x0:x1].copy()
                tx, ty = dx + dox, dy + doy
                tx0, ty0 = max(tx, 0), max(ty, 0)
                tx1 = min(tx + tile.shape[1], dw)
                ty1 = min(ty + tile.shape[0], dh)
                if tx1 > tx0 and ty1 > ty0:
                    saved = self._child_guard(dst, dfb, dox, doy)
                    dfb[ty0:ty1, tx0:tx1] = tile[:ty1 - ty0, :tx1 - tx0]
                    self._restore_children(dfb, saved)
        gc = self.gcs.get(gid)
        if gc is None or gc.values.get("graphics_exposures"):
            # NoExposure event: drawable, minor-opcode, major-opcode
            self._event(14, struct.pack("<IHB", dst, 0, 62), None, None)

    def _h_copy_plane(self, c, data, req):
        dst = struct.unpack("<I", req[4:8])[0]
        self._event(14, struct.pack("<IHB", dst, 0, 63), None, None)

    def _h_poly_fill_rect(self, c, data, req):
        did, gid = struct.unpack("<II", req[:8])
        gc = self.gcs.get(gid)
        fg = gc.values.get("foreground", 0) if gc else 0
        fb, ox, oy = self._drawable_fb(did)
        if fb is None:
            return
        saved = self._child_guard(did, fb, ox, oy)
        for off in range(8, len(req) - 7, 8):
            x, y, w, h = struct.unpack("<hhHH", req[off:off + 8])
            self._fill_rect(fb, x + ox, y + oy, w, h, fg)
        self._restore_children(fb, saved)

    def _h_draw_noop(self, c, data, req):
        pass

    def _h_put_image(self, c, fmt, req):
        did, gid, w, h, dx, dy, left_pad, depth = struct.unpack(
            "<IIHHhhBB2x", req[:20])
        fb, ox, oy = self._drawable_fb(did)
        if fb is None or fmt != 2 or depth not in (24, 32):
            return                          # ZPixmap 24/32 only
        import numpy as np

        stride = ((w * 32 + 31) // 32) * 4
        data_b = req[20:20 + stride * h]
        if len(data_b) < stride * h:
            return
        arr = np.frombuffer(data_b, np.uint8).reshape(h, stride)[:, :w * 4]
        arr = arr.reshape(h, w, 4)
        rgb = arr[:, :, [2, 1, 0]]          # BGRX little-endian -> RGB
        fh, fw = fb.shape[:2]
        x0, y0 = dx + ox, dy + oy
        sx0, sy0 = max(-x0, 0), max(-y0, 0)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1 = min(x0 + (w - sx0), fw)
        y1 = min(y0 + (h - sy0), fh)
        if x1 > x0 and y1 > y0:
            saved = self._child_guard(did, fb, ox, oy)
            fb[y0:y1, x0:x1] = rgb[sy0:sy0 + y1 - y0, sx0:sx0 + x1 - x0]
            self._restore_children(fb, saved)

    def _h_get_image(self, c, fmt, req):
        did, x, y, w, h, _mask = struct.unpack("<IhhHHI", req[:16])
        import numpy as np

        fb, ox, oy = self._drawable_fb(did)
        out = np.zeros((h, w, 4), np.uint8)
        if fb is not None:
            fh, fw = fb.shape[:2]
            x0, y0 = max(x + ox, 0), max(y + oy, 0)
            x1, y1 = min(x + ox + w, fw), min(y + oy + h, fh)
            if x1 > x0 and y1 > y0:
                out[:y1 - y0, :x1 - x0, [2, 1, 0]] = fb[y0:y1, x0:x1]
        self._reply(c, data_byte=24, fixed=struct.pack("<I", self.root_visual),
                    body=out.tobytes())

    def _h_image_text8(self, c, nchars, req):
        pass

    def _h_create_colormap(self, c, data, req):
        self.colormaps.add(struct.unpack("<I", req[:4])[0])

    def _h_free_colormap(self, c, data, req):
        self.colormaps.discard(struct.unpack("<I", req[:4])[0])

    def _h_alloc_color(self, c, data, req):
        _cmap, r, g, b = struct.unpack("<IHHH", req[:10])
        pixel = ((r >> 8) << 16) | ((g >> 8) << 8) | (b >> 8)
        self._reply(c, fixed=struct.pack("<HHH2xI", r, g, b, pixel))

    def _lookup_named(self, name: str):
        return _NAMED_COLORS.get(name.lower().replace(" ", ""))

    def _h_alloc_named_color(self, c, data, req):
        _cmap, nlen = struct.unpack("<IH2x", req[:8])
        name = req[8:8 + nlen].decode("latin-1")
        rgb = self._lookup_named(name)
        if rgb is None:
            return self._error(c, 15, 85)    # Name error
        r, g, b = (v * 257 for v in rgb)
        pixel = (rgb[0] << 16) | (rgb[1] << 8) | rgb[2]
        self._reply(c, fixed=struct.pack("<IHHHHHH", pixel, r, g, b, r, g, b))

    def _h_free_colors(self, c, data, req):
        pass

    def _h_query_colors(self, c, data, req):
        _cmap = struct.unpack("<I", req[:4])[0]
        pixels = struct.unpack(f"<{(len(req) - 4) // 4}I", req[4:])
        body = b""
        for p in pixels:
            r = ((p >> 16) & 0xFF) * 257
            g = ((p >> 8) & 0xFF) * 257
            b = (p & 0xFF) * 257
            body += struct.pack("<HHH2x", r, g, b)
        self._reply(c, fixed=struct.pack("<H", len(pixels)), body=body)

    def _h_lookup_color(self, c, data, req):
        _cmap, nlen = struct.unpack("<IH2x", req[:8])
        name = req[8:8 + nlen].decode("latin-1")
        rgb = self._lookup_named(name)
        if rgb is None:
            return self._error(c, 15, 92)
        r, g, b = (v * 257 for v in rgb)
        self._reply(c, fixed=struct.pack("<HHHHHH", r, g, b, r, g, b))

    def _h_create_cursor(self, c, data, req):
        self.cursors.add(struct.unpack("<I", req[:4])[0])

    def _h_free_cursor(self, c, data, req):
        self.cursors.discard(struct.unpack("<I", req[:4])[0])

    def _h_recolor_cursor(self, c, data, req):
        pass

    def _h_query_best_size(self, c, cls, req):
        _d, w, h = struct.unpack("<IHH", req[:8])
        self._reply(c, fixed=struct.pack("<HH", w, h))

    def _h_query_extension(self, c, data, req):
        (nlen,) = struct.unpack("<H2x", req[:4])
        name = req[4:4 + nlen].decode("latin-1")
        present, major, event, error = 0, 0, 0, 0
        if name == "RENDER":
            present, major = 1, self.RENDER_OPCODE
        elif name == "BIG-REQUESTS":
            present, major = 1, self.BIGREQ_OPCODE
        self._reply(c, fixed=struct.pack("<BBBB", present, major, event,
                                         error))

    def _h_list_extensions(self, c, data, req):
        names = [b"RENDER", b"BIG-REQUESTS"]
        body = b"".join(bytes([len(n)]) + n for n in names)
        self._reply(c, data_byte=len(names), body=body)

    # identity keymap: keycode 8+c carries keysym c for printable ASCII
    # (latin-1 keysyms equal their codepoints), so injected KeyPress
    # events translate to the exact character without shift state —
    # the same remapping trick input-injection tools use.  A few
    # specials live above the ASCII range:
    _SPECIAL_KEYSYMS = {231: 0xFF0D, 232: 0xFF09, 233: 0xFF08, 234: 0xFF1B}

    @classmethod
    def keycode_for(cls, char: str) -> int:
        """Keycode whose keysym is ``char`` under this server's keymap."""
        specials = {"\n": 231, "\r": 231, "\t": 232, "\b": 233,
                    "\x1b": 234}
        if char in specials:
            return specials[char]
        cp = ord(char)
        if 32 <= cp <= 126:
            return cp + 8
        raise ValueError(f"no keycode for {char!r}")

    def _h_get_keyboard_mapping(self, c, data, req):
        first, count = struct.unpack("<BB2x", req[:4])
        per = 2
        syms = []
        for kc in range(first, first + count):
            ks = self._SPECIAL_KEYSYMS.get(kc, 0)
            if not ks and 32 <= kc - 8 <= 126:
                ks = kc - 8
            syms += [ks, ks]
        body = struct.pack(f"<{len(syms)}I", *syms)
        self._reply(c, data_byte=per, body=body)

    def _h_get_modifier_mapping(self, c, data, req):
        per = 2
        self._reply(c, data_byte=per, body=b"\0" * (8 * per))

    def _h_change_keyboard_mapping(self, c, data, req):
        pass

    def _h_keyboard_control(self, c, data, req):
        pass

    def _h_get_keyboard_control(self, c, data, req):
        payload = struct.pack("<IBBHH2x", 0, 50, 50, 400, 100) + b"\0" * 32
        self._reply_raw(c, 1, payload)

    def _h_bell(self, c, data, req):
        pass

    def _h_pointer_control(self, c, data, req):
        pass

    def _h_get_pointer_control(self, c, data, req):
        self._reply(c, fixed=struct.pack("<HHH", 2, 1, 4))

    def _h_set_screen_saver(self, c, data, req):
        pass

    def _h_get_screen_saver(self, c, data, req):
        self._reply(c, fixed=struct.pack("<HHBB", 0, 0, 0, 0))

    def _h_change_hosts(self, c, data, req):
        pass

    def _h_list_hosts(self, c, data, req):
        self._reply(c, data_byte=0, fixed=struct.pack("<H", 0))

    def _h_set_access_control(self, c, data, req):
        pass

    def _h_set_close_down(self, c, data, req):
        pass

    def _h_kill_client(self, c, data, req):
        pass

    def _h_rotate_properties(self, c, data, req):
        pass

    def _h_force_screen_saver(self, c, data, req):
        pass

    def _h_set_pointer_mapping(self, c, data, req):
        self._reply(c, data_byte=0)

    def _h_get_pointer_mapping(self, c, data, req):
        body = bytes([1, 2, 3])
        self._reply(c, data_byte=3, body=body)

    def _h_set_modifier_mapping(self, c, data, req):
        self._reply(c, data_byte=0)

    def _h_no_op(self, c, data, req):
        pass

    def _h_allow_events(self, c, data, req):
        pass

    def _h_grab_key(self, c, data, req):
        pass

    def _h_grab_button(self, c, data, req):
        pass

    def _h_circulate_window(self, c, data, req):
        pass

    def _h_reparent_window(self, c, data, req):
        wid, parent, x, y = struct.unpack("<IIhh", req[:12])
        win = self.windows.get(wid)
        if win is None:
            return
        old = self.windows.get(win.parent)
        if old is not None and wid in old.children:
            old.children.remove(wid)
        win.parent, win.x, win.y = parent, x, y
        np_ = self.windows.get(parent)
        if np_ is not None:
            np_.children.append(wid)

    # -- RENDER extension (the subset Xft exercises) -------------------------

    def _render_dispatch(self, c: _Client, minor: int, req: bytes):
        if minor == 0:                       # QueryVersion
            self._reply(c, fixed=struct.pack("<II", 0, 11))
        elif minor == 1:                     # QueryPictFormats
            self._render_query_formats(c)
        elif minor == 4:                     # CreatePicture
            pid, drawable = struct.unpack("<II", req[:8])
            self.pictures[pid] = drawable
        elif minor == 17:                    # CreateGlyphSet
            gsid, fmt = struct.unpack("<II", req[:8])
            # glyph rasterisation below assumes A8 alpha maps (what Xft
            # uses for antialiased text); other formats store nothing
            self.glyphsets[gsid] = {} if fmt == 0x103 else None
        elif minor == 18:                    # ReferenceGlyphSet
            gsid, existing = struct.unpack("<II", req[:8])
            self.glyphsets[gsid] = self.glyphsets.get(existing, {})
        elif minor == 19:                    # FreeGlyphSet
            self.glyphsets.pop(struct.unpack("<I", req[:4])[0], None)
        elif minor == 20:                    # AddGlyphs
            self._render_add_glyphs(req)
        elif minor in (23, 24, 25):          # CompositeGlyphs8/16/32
            self._render_composite_glyphs(req, {23: 1, 24: 2, 25: 4}[minor])
        elif minor == 26:                    # FillRectangles
            self._render_fill_rects(req)
        # all other RENDER requests (Composite, Trapezoids, FreePicture,
        # SetPictureClipRectangles, ChangePicture...) are accepted silently
        elif self._log and minor not in (5, 7, 8, 10, 22):
            print(f"microx: RENDER minor {minor} ignored", flush=True)

    def _render_query_formats(self, c: _Client):
        def fmt(fid, depth, rs, rm, gs, gm, bs, bm, as_, am):
            return struct.pack("<IBB2xHHHHHHHHI", fid, 1, depth,
                               rs, rm, gs, gm, bs, bm, as_, am, 0)

        f_argb32 = fmt(0x101, 32, 16, 0xFF, 8, 0xFF, 0, 0xFF, 24, 0xFF)
        f_rgb24 = fmt(0x102, 24, 16, 0xFF, 8, 0xFF, 0, 0xFF, 0, 0)
        f_a8 = fmt(0x103, 8, 0, 0, 0, 0, 0, 0, 0, 0xFF)
        f_a1 = fmt(0x104, 1, 0, 0, 0, 0, 0, 0, 0, 1)
        f_a4 = fmt(0x105, 4, 0, 0, 0, 0, 0, 0, 0, 0xF)
        formats = f_argb32 + f_rgb24 + f_a8 + f_a1 + f_a4
        # screens: 1 screen, depths 24 + 32, our root visual -> RGB24
        pictvisual = struct.pack("<II", self.root_visual, 0x102)
        pictdepth24 = struct.pack("<BxH4x", 24, 1) + pictvisual
        pictdepth32 = struct.pack("<BxH4x", 32, 0)
        screen = struct.pack("<II", 2, 0x102) + pictdepth24 + pictdepth32
        subpixels = struct.pack("<I", 0)     # version>=0.6: 1 per screen
        body = formats + screen + subpixels
        fixed = struct.pack("<IIIII", 5, 1, 3, 1, 1)
        self._reply(c, fixed=fixed, body=body)

    def _render_add_glyphs(self, req: bytes):
        import numpy as np

        gsid, n = struct.unpack("<II", req[:8])
        gs = self.glyphsets.get(gsid)
        if gs is None:
            return
        ids = struct.unpack(f"<{n}I", req[8:8 + 4 * n])
        off = 8 + 4 * n
        infos = []
        for i in range(n):
            w, h, x, y, dx, dy = struct.unpack("<HHhhhh", req[off:off + 12])
            infos.append((w, h, x, y, dx, dy))
            off += 12
        data = req[off:]
        pos = 0
        for gid, (w, h, x, y, dx, dy) in zip(ids, infos):
            stride = (w + 3) & ~3            # A8 glyphs, 4-byte aligned rows
            nbytes = stride * h
            alpha = np.frombuffer(
                data[pos:pos + nbytes], np.uint8
            ).reshape(h, stride)[:, :w] if nbytes and \
                len(data) >= pos + nbytes else np.zeros((h, w), np.uint8)
            gs[gid] = (w, h, x, y, dx, dy, alpha.copy())
            pos += nbytes

    def _render_composite_glyphs(self, req: bytes, unit: int):
        import numpy as np

        _op, _src, dst_pict, _maskfmt, gsid, _sx, _sy = struct.unpack(
            "<B3xIIIIhh", req[:24])
        drawable = self.pictures.get(dst_pict)
        if drawable is None:
            return
        fb, ox, oy = self._drawable_fb(drawable)
        if fb is None:
            return
        gs = self.glyphsets.get(gsid) or {}
        saved = self._child_guard(drawable, fb, ox, oy)
        data = req[24:]
        pos = 0
        cx = cy = 0
        while pos + 8 <= len(data):
            nglyphs, dx, dy = struct.unpack("<B3xhh", data[pos:pos + 8])
            pos += 8
            if nglyphs == 255:               # glyphset switch element
                gsid = struct.unpack("<I", data[pos:pos + 4])[0]
                gs = self.glyphsets.get(gsid) or {}
                pos += 4
                continue
            cx += dx
            cy += dy
            for i in range(nglyphs):
                if unit == 1:
                    gid = data[pos]
                elif unit == 2:
                    gid = struct.unpack("<H", data[pos:pos + 2])[0]
                else:
                    gid = struct.unpack("<I", data[pos:pos + 4])[0]
                pos += unit
                glyph = gs.get(gid)
                if glyph is None:
                    continue
                w, h, gx, gy, gdx, gdy, alpha = glyph
                x0, y0 = cx - gx + ox, cy - gy + oy
                fh, fw = fb.shape[:2]
                sx0, sy0 = max(-x0, 0), max(-y0, 0)
                x0c, y0c = max(x0, 0), max(y0, 0)
                x1 = min(x0 + w, fw)
                y1 = min(y0 + h, fh)
                if x1 > x0c and y1 > y0c and w and h:
                    a = alpha[sy0:sy0 + y1 - y0c, sx0:sx0 + x1 - x0c]
                    a = a[:, :, None].astype(np.uint16)
                    region = fb[y0c:y1, x0c:x1]
                    # composite black text over background by alpha
                    fb[y0c:y1, x0c:x1] = (
                        region.astype(np.uint16) * (255 - a) // 255
                    ).astype(np.uint8)
                cx += gdx
                cy += gdy
            pad = _pad4(unit * nglyphs)
            pos += pad
        self._restore_children(fb, saved)

    def _render_fill_rects(self, req: bytes):
        _op, dst_pict, r, g, b, _a = struct.unpack("<B3xIHHHH", req[:16])
        drawable = self.pictures.get(dst_pict)
        if drawable is None:
            return
        fb, ox, oy = self._drawable_fb(drawable)
        if fb is None:
            return
        pixel = ((r >> 8) << 16) | ((g >> 8) << 8) | (b >> 8)
        saved = self._child_guard(drawable, fb, ox, oy)
        for off in range(16, len(req) - 7, 8):
            x, y, w, h = struct.unpack("<hhHH", req[off:off + 8])
            self._fill_rect(fb, x + ox, y + oy, w, h, pixel)
        self._restore_children(fb, saved)


_HANDLERS = {
    1: MicroXServer._h_create_window,
    2: MicroXServer._h_change_attrs,
    3: MicroXServer._h_get_attrs,
    4: MicroXServer._h_destroy_window,
    5: MicroXServer._h_destroy_subwindows,
    6: MicroXServer._h_draw_noop,            # ChangeSaveSet
    7: MicroXServer._h_reparent_window,
    8: MicroXServer._h_map_window,
    9: MicroXServer._h_map_subwindows,
    10: MicroXServer._h_unmap_window,
    11: MicroXServer._h_unmap_subwindows,
    12: MicroXServer._h_configure_window,
    13: MicroXServer._h_circulate_window,
    14: MicroXServer._h_get_geometry,
    15: MicroXServer._h_query_tree,
    16: MicroXServer._h_intern_atom,
    17: MicroXServer._h_get_atom_name,
    18: MicroXServer._h_change_property,
    19: MicroXServer._h_delete_property,
    20: MicroXServer._h_get_property,
    21: MicroXServer._h_list_properties,
    22: MicroXServer._h_set_selection_owner,
    23: MicroXServer._h_get_selection_owner,
    24: MicroXServer._h_convert_selection,
    25: MicroXServer._h_send_event,
    26: MicroXServer._h_grab_pointer,
    27: MicroXServer._h_ungrab,
    28: MicroXServer._h_grab_button,
    29: MicroXServer._h_ungrab,
    30: MicroXServer._h_draw_noop,           # ChangeActivePointerGrab
    31: MicroXServer._h_grab_keyboard,
    32: MicroXServer._h_ungrab,
    33: MicroXServer._h_grab_key,
    34: MicroXServer._h_ungrab,
    35: MicroXServer._h_allow_events,
    36: MicroXServer._h_grab_server,
    37: MicroXServer._h_grab_server,
    38: MicroXServer._h_query_pointer,
    39: MicroXServer._h_get_motion_events,
    40: MicroXServer._h_translate_coords,
    41: MicroXServer._h_warp_pointer,
    42: MicroXServer._h_set_input_focus,
    43: MicroXServer._h_get_input_focus,
    44: MicroXServer._h_query_keymap,
    45: MicroXServer._h_open_font,
    46: MicroXServer._h_close_font,
    47: MicroXServer._h_query_font,
    48: MicroXServer._h_query_text_extents,
    49: MicroXServer._h_list_fonts,
    50: MicroXServer._h_list_fonts_with_info,
    51: MicroXServer._h_draw_noop,           # SetFontPath
    52: MicroXServer._h_list_hosts,          # GetFontPath ~ empty list
    53: MicroXServer._h_create_pixmap,
    54: MicroXServer._h_free_pixmap,
    55: MicroXServer._h_create_gc,
    56: MicroXServer._h_change_gc,
    57: MicroXServer._h_copy_gc,
    58: MicroXServer._h_set_dashes,
    59: MicroXServer._h_set_clip_rects,
    60: MicroXServer._h_free_gc,
    61: MicroXServer._h_clear_area,
    62: MicroXServer._h_copy_area,
    63: MicroXServer._h_copy_plane,
    64: MicroXServer._h_draw_noop,           # PolyPoint
    65: MicroXServer._h_draw_noop,           # PolyLine
    66: MicroXServer._h_draw_noop,           # PolySegment
    67: MicroXServer._h_draw_noop,           # PolyRectangle
    68: MicroXServer._h_draw_noop,           # PolyArc
    69: MicroXServer._h_draw_noop,           # FillPoly
    70: MicroXServer._h_poly_fill_rect,
    71: MicroXServer._h_draw_noop,           # PolyFillArc
    72: MicroXServer._h_put_image,
    73: MicroXServer._h_get_image,
    74: MicroXServer._h_draw_noop,           # PolyText8
    75: MicroXServer._h_draw_noop,           # PolyText16
    76: MicroXServer._h_image_text8,
    77: MicroXServer._h_image_text8,
    78: MicroXServer._h_create_colormap,
    79: MicroXServer._h_free_colormap,
    80: MicroXServer._h_draw_noop,           # CopyColormapAndFree
    81: MicroXServer._h_draw_noop,           # InstallColormap
    82: MicroXServer._h_draw_noop,           # UninstallColormap
    83: MicroXServer._h_list_hosts,          # ListInstalledColormaps ~ 0
    84: MicroXServer._h_alloc_color,
    85: MicroXServer._h_alloc_named_color,
    86: MicroXServer._h_draw_noop,           # AllocColorCells
    87: MicroXServer._h_draw_noop,           # AllocColorPlanes
    88: MicroXServer._h_free_colors,
    89: MicroXServer._h_draw_noop,           # StoreColors
    90: MicroXServer._h_draw_noop,           # StoreNamedColor
    91: MicroXServer._h_query_colors,
    92: MicroXServer._h_lookup_color,
    93: MicroXServer._h_create_cursor,
    94: MicroXServer._h_create_cursor,       # CreateGlyphCursor
    95: MicroXServer._h_free_cursor,
    96: MicroXServer._h_recolor_cursor,
    97: MicroXServer._h_query_best_size,
    98: MicroXServer._h_query_extension,
    99: MicroXServer._h_list_extensions,
    100: MicroXServer._h_change_keyboard_mapping,
    101: MicroXServer._h_get_keyboard_mapping,
    102: MicroXServer._h_keyboard_control,
    103: MicroXServer._h_get_keyboard_control,
    104: MicroXServer._h_bell,
    105: MicroXServer._h_pointer_control,
    106: MicroXServer._h_get_pointer_control,
    107: MicroXServer._h_set_screen_saver,
    108: MicroXServer._h_get_screen_saver,
    109: MicroXServer._h_change_hosts,
    110: MicroXServer._h_list_hosts,
    111: MicroXServer._h_set_access_control,
    112: MicroXServer._h_set_close_down,
    113: MicroXServer._h_kill_client,
    114: MicroXServer._h_rotate_properties,
    115: MicroXServer._h_force_screen_saver,
    116: MicroXServer._h_set_pointer_mapping,
    117: MicroXServer._h_get_pointer_mapping,
    118: MicroXServer._h_set_modifier_mapping,
    119: MicroXServer._h_get_modifier_mapping,
    127: MicroXServer._h_no_op,
}


class XWire:
    """A tiny raw-protocol X client for driving/inspecting a display.

    Works against any display (it speaks plain X11), but exists for
    MicroX: tests whose display server is a subprocess can still
    screenshot windows (GetImage, like ``xwd``) and inject input events
    (SendEvent KeyPress/ButtonPress, like ``xdotool``) over the wire.
    """

    def __init__(self, display: str):
        num = int(display.rsplit(":", 1)[-1].split(".")[0])
        self.sock = socket.socket(socket.AF_UNIX)
        self.sock.connect(f"/tmp/.X11-unix/X{num}")
        self.sock.settimeout(20)
        self.sock.sendall(struct.pack("<BBHHHH2x", 0x6C, 0, 11, 0, 0, 0))
        status, _maj, _min, words = struct.unpack("<BxHHH", self._recv(8))
        if status != 1:
            raise RuntimeError("X connection refused")
        setup = self._recv(words * 4)
        vendor_len = struct.unpack("<H", setup[16:18])[0]
        n_formats = setup[21]
        off = 32 + vendor_len + _pad4(vendor_len) + 8 * n_formats
        self.root = struct.unpack("<I", setup[off:off + 4])[0]
        self.seq = 0
        self._evq = []

    def _recv(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise RuntimeError("X server closed the connection")
            buf += chunk
        return buf

    def _request(self, opcode: int, data: int, payload: bytes) -> None:
        total = 4 + len(payload)
        self.sock.sendall(struct.pack("<BBH", opcode, data, total // 4)
                          + payload)
        self.seq = (self.seq + 1) & 0xFFFF

    def _reply(self) -> bytes:
        """Next reply (32-byte head + extra); queues events seen on the
        way (events/errors are 32 bytes with first byte != 1)."""
        while True:
            head = self._recv(32)
            if head[0] == 1:
                extra = struct.unpack("<I", head[4:8])[0] * 4
                return head + (self._recv(extra) if extra else b"")
            if head[0] == 0:
                raise RuntimeError(f"X error code {head[1]}")
            self._evq.append(head)

    def query_tree(self, wid: int):
        self._request(15, 0, struct.pack("<I", wid))
        rep = self._reply()
        n = struct.unpack("<H", rep[16:18])[0]
        return list(struct.unpack(f"<{n}I", rep[32:32 + 4 * n]))

    def get_geometry(self, wid: int):
        self._request(14, 0, struct.pack("<I", wid))
        rep = self._reply()
        x, y, w, h = struct.unpack("<hhHH", rep[12:20])
        return x, y, w, h

    def get_image(self, wid: int, x: int, y: int, w: int, h: int):
        """RGB uint8 (h, w, 3) via a ZPixmap GetImage."""
        import numpy as np

        self._request(73, 2, struct.pack("<IhhHHI", wid, x, y, w, h,
                                         0xFFFFFFFF))
        rep = self._reply()
        data = np.frombuffer(rep[32:32 + w * h * 4], np.uint8)
        return data.reshape(h, w, 4)[:, :, [2, 1, 0]].copy()

    def screenshot(self, wid: int | None = None):
        """Image of ``wid``, or of the largest mapped child of root."""
        if wid is None:
            best, area = None, -1
            for kid in self.query_tree(self.root):
                try:
                    _, _, w, h = self.get_geometry(kid)
                except RuntimeError:
                    continue
                if w * h > area:
                    best, area = kid, w * h
            if best is None:
                return None
            wid = best
        _, _, w, h = self.get_geometry(wid)
        return self.get_image(wid, 0, 0, w, h)

    def _send_input(self, code: int, detail: int, wid: int, x: int,
                    y: int) -> None:
        ev = struct.pack("<BBHIIIIhhhhHBx", code, detail, 0, 12345,
                         self.root, wid, 0, x, y, x, y, 0, 1)
        self._request(25, 0, struct.pack("<II", wid, 0) + ev)

    def click(self, wid: int, x: int = 2, y: int = 2,
              button: int = 1) -> None:
        """EnterNotify + ButtonPress/Release through the wire
        (xdotool-style).  The crossing event matters: Tk's button
        bindings only invoke the command when the pointer entered the
        widget before the press (tk::Priv(window) is set on <Enter>)."""
        # EnterNotify: same 32-byte shape, but the last two bytes are
        # mode (Normal=0) and same-screen|focus flags (0x02)
        ev = struct.pack("<BBHIIIIhhhhHBB", 7, 0, 0, 12344, self.root,
                         wid, 0, x, y, x, y, 0, 0, 2)
        self._request(25, 0, struct.pack("<II", wid, 0) + ev)
        self._send_input(4, button, wid, x, y)
        self._send_input(5, button, wid, x, y)

    def type_text(self, wid: int, text: str) -> None:
        """KeyPress+KeyRelease per character (identity keymap)."""
        for ch in text:
            kc = MicroXServer.keycode_for(ch)
            self._send_input(2, kc, wid, 1, 1)
            self._send_input(3, kc, wid, 1, 1)

    def close(self) -> None:
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def main(argv=None) -> int:
    import sys
    import time

    argv = argv if argv is not None else sys.argv[1:]
    num = None
    if argv and argv[0].startswith(":"):
        num = int(argv[0][1:])
    srv = MicroXServer(display=num, log="-v" in argv)
    srv.start()
    print(f"microx serving on DISPLAY={srv.display}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
