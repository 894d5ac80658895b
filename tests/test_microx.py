"""MicroX — the in-repo minimal X11 display server (gui/microx.py).

The reference is a desktop GUI app (``/root/reference/UI_handler.py:169-311``)
but CI-like images ship no display server, so the framework provides its own:
enough X11 core protocol + RENDER for Tk 8.6/Xft to construct, map, draw and
drive windows headlessly.  These tests cover three layers:

1. wire protocol (raw socket): connection setup, atoms, properties;
2. a REAL ``tkinter.Tk()`` construction + widget event round-trip against a
   spawned MicroX (the GIL constraint makes the server a subprocess when the
   Tk client runs in this process — see ``MicroXServer.spawn``);
3. framebuffer rendering: an in-process server snapshots a Tk client run in
   a subprocess, and the image must contain actual rendered content.
"""

import os
import socket
import struct
import subprocess
import sys
import time

import pytest

from solex_ser_recon_en_tpu.gui.microx import MicroXServer


def _connect(xs: MicroXServer):
    s = socket.socket(socket.AF_UNIX)
    s.connect(f"/tmp/.X11-unix/X{xs.display[1:]}")
    s.settimeout(10)
    s.sendall(struct.pack("<BBHHHH2x", 0x6C, 0, 11, 0, 0, 0))
    status, major, minor, length = struct.unpack("<BxHHH", _recvn(s, 8))
    assert status == 1 and major == 11
    setup = _recvn(s, length * 4)
    return s, setup


def _recvn(s, n):
    buf = b""
    while len(buf) < n:
        chunk = s.recv(n - len(buf))
        assert chunk, "server closed connection"
        buf += chunk
    return buf


def _req(opcode, data, payload):
    total = 4 + len(payload)
    assert total % 4 == 0
    return struct.pack("<BBH", opcode, data, total // 4) + payload


def _pad(b):
    return b + b"\0" * ((4 - len(b) % 4) % 4)


def test_setup_block_structure():
    with MicroXServer() as xs:
        s, setup = _connect(xs)
        # fixed part: release, rid base/mask, motion, vendor len, ...
        vendor_len, max_req = struct.unpack("<HH", setup[16:20])
        n_screens, n_formats = setup[20], setup[21]
        assert n_screens == 1 and n_formats == 3
        assert max_req >= 0xFFFF - 1
        # root window id / visual parse out of the screen block
        off = 32 + vendor_len + ((4 - vendor_len % 4) % 4) + 8 * n_formats
        root, cmap, white, black = struct.unpack("<IIII", setup[off:off + 16])
        assert white == 0xFFFFFF and black == 0
        root_depth = setup[off + 38]
        assert root_depth == 24
        s.close()


def test_intern_atom_and_name_roundtrip():
    with MicroXServer() as xs:
        s, _ = _connect(xs)
        name = b"WM_DELETE_WINDOW"
        s.sendall(_req(16, 0, struct.pack("<H2x", len(name)) + _pad(name)))
        rep = _recvn(s, 32)
        assert rep[0] == 1
        atom = struct.unpack("<I", rep[8:12])[0]
        assert atom == 69  # first after the 68 predefined atoms
        # predefined atoms resolve without registration
        s.sendall(_req(16, 1, struct.pack("<H2x", 8) + _pad(b"WM_CLASS")))
        rep = _recvn(s, 32)
        assert struct.unpack("<I", rep[8:12])[0] == 67
        # GetAtomName round-trips
        s.sendall(_req(17, 0, struct.pack("<I", 67)))
        rep = _recvn(s, 32)
        nlen = struct.unpack("<H", rep[8:10])[0]
        extra = struct.unpack("<I", rep[4:8])[0] * 4
        body = _recvn(s, extra)
        assert body[:nlen] == b"WM_CLASS"
        s.close()


def test_window_property_roundtrip_and_map_notify():
    with MicroXServer() as xs:
        s, setup = _connect(xs)
        rid_base = struct.unpack("<I", setup[4:8])[0]
        wid = rid_base + 1
        root = xs.root_id
        # CreateWindow with StructureNotify selected (event_mask bit 17)
        payload = struct.pack("<IIhhHHHHII", wid, root, 10, 10, 300, 200, 0,
                              1, xs.root_visual, 1 << 11)  # event_mask flag
        payload += struct.pack("<I", 1 << 17)
        s.sendall(_req(1, 24, payload))
        # ChangeProperty WM_NAME=STRING "hello"
        val = b"hello"
        prop = struct.pack("<IIIB3xI", wid, 39, 31, 8, len(val)) + _pad(val)
        s.sendall(_req(18, 0, prop))
        # GetProperty it back
        s.sendall(_req(20, 0, struct.pack("<IIIII", wid, 39, 0, 0, 16)))
        rep = _recvn(s, 32)
        fmt = rep[1]
        ptype, after, nunits = struct.unpack("<III", rep[8:20])
        extra = struct.unpack("<I", rep[4:8])[0] * 4
        body = _recvn(s, extra)
        assert fmt == 8 and ptype == 31 and after == 0 and nunits == 5
        assert body[:5] == b"hello"
        # MapWindow delivers MapNotify (StructureNotify selected)
        s.sendall(_req(8, 0, struct.pack("<I", wid)))
        ev = _recvn(s, 32)
        assert ev[0] == 19  # MapNotify
        evwin = struct.unpack("<I", ev[4:8])[0]
        assert evwin == wid
        s.close()


def test_unknown_request_returns_error_not_hang():
    with MicroXServer() as xs:
        s, _ = _connect(xs)
        s.sendall(_req(125, 0, struct.pack("<I", 0)))  # unassigned core op
        rep = _recvn(s, 32)
        assert rep[0] == 0 and rep[1] == 1  # Error, code Request
        # the connection stays usable afterwards
        s.sendall(_req(43, 0, b""))  # GetInputFocus
        rep = _recvn(s, 32)
        assert rep[0] == 1
        s.close()


# ---------------------------------------------------------------------------
# real-toolkit layer

tkinter = pytest.importorskip("tkinter")


# real-toolkit tests use the session-scoped ``microx_display`` fixture
# from tests/conftest.py: one display for the whole session, because a Tk
# client whose display dies exits the process via Xlib's XIO handler.


def test_tkinter_constructs_and_updates(microx_display):
    root = tkinter.Tk()
    try:
        root.title("microx")
        e = tkinter.Entry(root)
        e.insert(0, "5")
        e.pack()
        tkinter.Button(root, text="OK").pack()
        root.update()
        assert e.get() == "5"
        # geometry queries answer through the server
        assert root.winfo_screenwidth() >= 800
        assert root.winfo_depth() == 24
    finally:
        root.destroy()


def test_tkinter_event_roundtrip(microx_display):
    root = tkinter.Tk()
    fired = []
    try:
        b = tkinter.Button(root, text="go", command=lambda: fired.append(1))
        b.pack()
        root.update()
        b.invoke()
        root.update()
        assert fired == [1]
    finally:
        root.destroy()


def test_snapshot_renders_real_tk_content(tmp_path):
    """In-process server + subprocess Tk client: the framebuffer must show
    rendered content (text glyphs composit to dark pixels on the default
    light background)."""
    import numpy as np

    client = tmp_path / "client.py"
    client.write_text(
        "import tkinter, sys\n"
        "root = tkinter.Tk()\n"
        "tkinter.Label(root, text='Pixel shift 1234').pack()\n"
        "root.update()\n"
        "print('MAPPED', flush=True)\n"
        "root.after(30000, root.destroy)\n"
        "root.mainloop()\n"
    )
    xs = MicroXServer().start()
    try:
        env = dict(os.environ, DISPLAY=xs.display)
        # a bare-stdlib client: strip the preloading site dir so the
        # subprocess starts fast even when the accelerator tunnel is down
        p = subprocess.Popen([sys.executable, str(client)], env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True)
        try:
            from solex_ser_recon_en_tpu.gui.microx import wait_for_line

            assert wait_for_line(p, "MAPPED", timeout_s=60), \
                "client died or never mapped"
            deadline = time.monotonic() + 20
            snap = None
            while time.monotonic() < deadline:
                snap = xs.snapshot()
                if snap is not None and (snap < 128).any():
                    break
                time.sleep(0.2)
            assert snap is not None, "no framebuffer was created"
            dark = (snap < 128).all(axis=2).mean()
            assert dark > 0.001, "no text pixels rendered"
            assert len(np.unique(snap.reshape(-1, 3), axis=0)) > 2
        finally:
            p.terminate()
    finally:
        xs.stop()


# ---------------------------------------------------------------------------
# wire-client layer (XWire): screenshots + input injection over the protocol

def test_wire_screenshot_of_real_window(microx_display):
    """xwd-style: a second X client screenshots the real Tk window over
    the wire (QueryTree -> GetGeometry -> GetImage) — works even though
    the display server is a subprocess."""
    import numpy as np

    from solex_ser_recon_en_tpu.gui.microx import XWire

    root = tkinter.Tk()
    try:
        tkinter.Label(root, text="Sol'Ex reconstruction 0123").pack()
        root.update()
        for _ in range(3):
            root.update()
        with XWire(microx_display) as wire:
            img = wire.screenshot(root.winfo_id())
        assert img is not None and img.ndim == 3
        dark = (img < 128).all(axis=2).mean()
        assert dark > 0.001, "no text pixels over the wire"
        assert len(np.unique(img.reshape(-1, 3), axis=0)) > 2
    finally:
        root.destroy()


def test_wire_button_click_invokes_real_tk_command(microx_display):
    """xdotool-style: a ButtonPress/Release pair injected through the X
    protocol (SendEvent) lands on the real Tk button and runs its
    command."""
    from solex_ser_recon_en_tpu.gui.microx import XWire

    root = tkinter.Tk()
    fired = []
    try:
        b = tkinter.Button(root, text="go",
                           command=lambda: fired.append(1))
        b.pack()
        root.update()
        with XWire(microx_display) as wire:
            wire.click(b.winfo_id(), x=3, y=3)
        for _ in range(100):            # events arrive async over the socket
            root.update()
            if fired:
                break
            time.sleep(0.02)
        assert fired == [1]
    finally:
        root.destroy()


def test_wire_typing_into_real_tk_entry(microx_display):
    """KeyPress events injected over the wire translate through the
    identity keymap into characters in a real Tk Entry."""
    from solex_ser_recon_en_tpu.gui.microx import XWire

    root = tkinter.Tk()
    try:
        e = tkinter.Entry(root)
        e.pack()
        root.update()
        e.focus_force()
        root.update()
        with XWire(microx_display) as wire:
            wire.type_text(e.winfo_id(), "shift=5")
        for _ in range(100):            # events arrive async over the socket
            root.update()
            if len(e.get()) >= 7:
                break
            time.sleep(0.02)
        assert e.get() == "shift=5"
    finally:
        root.destroy()


# ---------------------------------------------------------------------------
# framebuffer drawing fidelity (protocol level, no Tk)

def _setup_window(xs, s, setup, w=200, h=100, x=0, y=0, parent=None,
                  wid_off=1):
    rid_base = struct.unpack("<I", setup[4:8])[0]
    wid = rid_base + wid_off
    parent = parent if parent is not None else xs.root_id
    payload = struct.pack("<IIhhHHHHII", wid, parent, x, y, w, h, 0, 1,
                          xs.root_visual, 0)
    s.sendall(_req(1, 24, payload))
    s.sendall(_req(8, 0, struct.pack("<I", wid)))    # MapWindow
    return wid


def _fill(s, wid, gc, x, y, w, h):
    s.sendall(_req(70, 0, struct.pack("<IIhhHH", wid, gc, x, y, w, h)))


def _make_gc(s, setup, wid, fg, off=100):
    gid = struct.unpack("<I", setup[4:8])[0] + off
    s.sendall(_req(55, 0, struct.pack("<III", gid, wid, 0x04)
                   + struct.pack("<I", fg)))         # foreground only
    return gid


def test_children_clip_parent_drawing():
    """X11 semantics: a parent-window fill must not touch the pixels of a
    mapped child window (a toplevel background repaint used to wipe
    widget pixels in screenshots)."""
    with MicroXServer() as xs:
        s, setup = _connect(xs)
        top = _setup_window(xs, s, setup, w=100, h=50, wid_off=1)
        kid = _setup_window(xs, s, setup, w=20, h=10, x=30, y=20,
                            parent=top, wid_off=2)
        red = _make_gc(s, setup, kid, 0xFF0000, off=100)
        _fill(s, kid, red, 0, 0, 20, 10)             # child turns red
        gray = _make_gc(s, setup, top, 0x808080, off=101)
        _fill(s, top, gray, 0, 0, 100, 50)           # parent repaint
        s.sendall(_req(43, 0, b""))                  # sync
        _recvn(s, 32)
        snap = xs.snapshot(top)
        assert tuple(snap[25, 40]) == (255, 0, 0), "child pixels wiped"
        assert tuple(snap[5, 5]) == (128, 128, 128)
        s.close()


def test_resize_preserves_framebuffer_content():
    with MicroXServer() as xs:
        s, setup = _connect(xs)
        top = _setup_window(xs, s, setup, w=80, h=40, wid_off=1)
        blue = _make_gc(s, setup, top, 0x0000FF, off=100)
        _fill(s, top, blue, 0, 0, 80, 40)
        # ConfigureWindow: grow to 160x80 (mask: width|height = 0b1100)
        s.sendall(_req(12, 0, struct.pack("<IH2xII", top, 0b1100, 160, 80)))
        _fill(s, top, blue, 100, 50, 1, 1)           # touch -> realloc fb
        s.sendall(_req(43, 0, b""))
        _recvn(s, 32)
        snap = xs.snapshot(top)
        assert snap.shape[:2] == (80, 160)
        assert tuple(snap[10, 10]) == (0, 0, 255), "content lost on resize"
        s.close()


def test_clear_area_zero_extent_clears_to_edge_only():
    with MicroXServer() as xs:
        s, setup = _connect(xs)
        top = _setup_window(xs, s, setup, w=100, h=50, wid_off=1)
        kid = _setup_window(xs, s, setup, w=100, h=10, x=0, y=40,
                            parent=top, wid_off=2)
        green = _make_gc(s, setup, kid, 0x00FF00, off=100)
        _fill(s, kid, green, 0, 0, 100, 10)
        # ClearArea(x=10, y=0, w=0, h=30) on the PARENT: w=0 means
        # "to the right edge", and the fill must stop at y=30
        s.sendall(_req(61, 0, struct.pack("<IhhHH", top, 10, 0, 0, 30)))
        s.sendall(_req(43, 0, b""))
        _recvn(s, 32)
        snap = xs.snapshot(top)
        assert tuple(snap[45, 50]) == (0, 255, 0), "child (sibling band) hit"
        assert tuple(snap[10, 50]) == (217, 217, 217)  # default background
        s.close()
