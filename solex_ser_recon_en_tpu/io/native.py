"""ctypes bindings for the native SER I/O library (native/ser_io.cpp).

Builds the shared library on first use with the system compiler (cached
under ~/.cache/solex_native); every entry point degrades to the pure-Python
mmap reader (io/ser.py) when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "ser_io.cpp")
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "solex_native")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    # the artifact name is keyed to the source content: dlopen caches
    # loaded libraries BY PATH, so rebuilding over the same filename in a
    # process that already loaded a stale copy would silently return the
    # old handle; a content-keyed name also makes the mtime comparison
    # (foolable by rsync -a / image layers) irrelevant
    import hashlib

    with open(src, "rb") as f:
        key = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_CACHE, f"libser_io-{key}.so")
    if os.path.exists(so):
        return so
    os.makedirs(_CACHE, exist_ok=True)
    # -march=native lets the autovectoriser use the full SIMD width for the
    # fused mean/max sweep; fall back for toolchains that reject it
    for flags in (["-O3", "-march=native"], ["-O3"], ["-O2"]):
        cmd = ["g++", *flags, "-shared", "-fPIC", "-o", so, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            break
        except Exception:
            continue
    else:
        return None
    # opportunistic cleanup of superseded builds (may be loaded elsewhere;
    # unlink is safe on Linux, failures are fine)
    try:
        for name in os.listdir(_CACHE):
            if name.startswith("libser_io") and name != os.path.basename(so):
                try:
                    os.remove(os.path.join(_CACHE, name))
                except OSError:
                    pass
    except OSError:
        pass
    return so


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SOLEX_NO_NATIVE") == "1":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        if not hasattr(lib, "ser_mean_max_band"):
            # content-keyed artifacts always match their source's symbols;
            # a miss means a corrupt/hand-placed file — fall back to the
            # Python reader rather than bind a partial ABI
            return None
        lib.ser_open.restype = ctypes.c_int
        lib.ser_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.ser_prefetch.restype = ctypes.c_int
        lib.ser_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
        lib.ser_read.restype = ctypes.c_int
        lib.ser_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_void_p,
        ]
        lib.ser_close.restype = None
        lib.ser_close.argtypes = [ctypes.c_void_p]
        lib.ser_mean_max.restype = ctypes.c_int
        lib.ser_mean_max.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ser_mean_max_band.restype = ctypes.c_int
        lib.ser_mean_max_band.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


class NativeSerReader:
    """Raw-slab SER reader over the native library.

    Raises RuntimeError when the native library can't be used; callers
    (io/feeder.py) fall back to the Python SerReader.
    """

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ser_io unavailable")
        self._lib = lib
        h = ctypes.c_void_p()
        w = ctypes.c_uint32()
        ht = ctypes.c_uint32()
        d = ctypes.c_uint32()
        n = ctypes.c_uint32()
        rc = lib.ser_open(path.encode(), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(ht), ctypes.byref(d), ctypes.byref(n))
        if rc != 0:
            raise RuntimeError(f"ser_open failed ({rc}) for {path}")
        self._h = h
        self.Width, self.Height = int(w.value), int(ht.value)
        self.pixel_depth = int(d.value)
        self.frame_count = int(n.value)
        self.frame_bytes = self.Width * self.Height * (self.pixel_depth // 8)
        self.dtype = np.uint8 if self.pixel_depth == 8 else np.dtype("<u2")

    def prefetch(self, start: int, count: int) -> None:
        self._lib.ser_prefetch(self._h, start, count)

    def read(self, start: int, count: int) -> np.ndarray:
        """(count, Height, Width) raw frames (single native memcpy)."""
        out = np.empty(
            (count, self.Height, self.Width), dtype=self.dtype
        )
        rc = self._lib.ser_read(self._h, start, count, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError(f"ser_read failed ({rc})")
        return out

    def mean_max(self):
        """Fused single-pass (sum uint64, max uint16) in raw layout.

        One sweep over the scan instead of numpy's two reduction passes —
        see native/ser_io.cpp:ser_mean_max.  The GIL is released for the
        duration of the call (ctypes), so callers can overlap other host
        work.
        """
        s = np.zeros((self.Height, self.Width), dtype=np.uint64)
        m = np.zeros((self.Height, self.Width), dtype=np.uint16)
        rc = self._lib.ser_mean_max(
            self._h,
            s.ctypes.data_as(ctypes.c_void_p),
            m.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"ser_mean_max failed ({rc})")
        return s, m

    def mean_max_band(self, r0: int, r1: int, c0: int, c1: int):
        """Fused single-pass sum/max + raw-rect band extraction.

        One sweep computes pass A's reductions AND copies the raw-coordinate
        rectangle rows [r0, r1) x cols [c0, c1) of every frame into a
        (frames, r1-r0, c1-c0) slab while the frame is cache-hot — the recon
        (pass B) then gathers from this compact buffer instead of re-sweeping
        the whole scan (native/ser_io.cpp:ser_mean_max_band).
        """
        s = np.zeros((self.Height, self.Width), dtype=np.uint64)
        m = np.zeros((self.Height, self.Width), dtype=np.uint16)
        band = np.empty((self.frame_count, r1 - r0, c1 - c0), dtype=self.dtype)
        rc = self._lib.ser_mean_max_band(
            self._h,
            s.ctypes.data_as(ctypes.c_void_p),
            m.ctypes.data_as(ctypes.c_void_p),
            r0, r1, c0, c1,
            band.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"ser_mean_max_band failed ({rc})")
        return s, m, band

    def close(self) -> None:
        if getattr(self, "_h", None) is not None:
            self._lib.ser_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
