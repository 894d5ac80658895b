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
        # key = source + flag recipe: a flag change (e.g. fp-contract)
        # must produce a new artifact just like a source change
        key = hashlib.sha256(f.read() + b"|v2:fp-contract=off").hexdigest()[:16]
    so = os.path.join(_CACHE, f"libser_io-{key}.so")
    if os.path.exists(so):
        return so
    os.makedirs(_CACHE, exist_ok=True)
    # -march=native lets the autovectoriser use the full SIMD width for the
    # fused mean/max sweep; fall back for toolchains that reject it.
    # -ffp-contract=off globally: g++ contracts a*b+c to FMA by default,
    # which rounds differently from numpy's separate multiply and add —
    # observed as 1-LSB divergence in ser_recon_f64's scalar tail (the
    # last <=32 frames of every scan) vs the bit-exactness contract; the
    # AVX-512 intrinsic paths are explicit mul/add and unaffected.
    for flags in (["-O3", "-march=native", "-ffp-contract=off"],
                  ["-O3", "-ffp-contract=off"], ["-O2"]):
        cmd = ["g++", *flags, "-shared", "-fPIC", "-o", so, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            break
        except Exception:
            continue
    else:
        return None
    # opportunistic cleanup of superseded builds (may be loaded elsewhere;
    # unlink is safe on Linux, failures are fine).  Only artifacts older
    # than a grace period are removed: a concurrent process running an
    # older checkout may be between its os.path.exists(so) check and
    # ctypes.CDLL(so) — deleting its fresh artifact in that window would
    # silently drop it to the slow Python reader.
    try:
        import time

        cutoff = time.time() - 7 * 24 * 3600
        for name in os.listdir(_CACHE):
            if name.startswith("libser_io") and name != os.path.basename(so):
                p = os.path.join(_CACHE, name)
                try:
                    if os.path.getmtime(p) < cutoff:
                        os.remove(p)
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
        if hasattr(lib, "ser_sample_stats"):
            lib.ser_sample_stats.restype = ctypes.c_int
            lib.ser_sample_stats.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint32,   # step
                ctypes.c_void_p,   # sum_out u64
                ctypes.c_void_p,   # max_out u16
            ]
            lib.ser_band_stats.restype = ctypes.c_int
            lib.ser_band_stats.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint32,   # r0
                ctypes.c_uint32,   # r1
                ctypes.c_uint32,   # c0
                ctypes.c_uint32,   # c1
                ctypes.c_void_p,   # sum_out u64 (band-local)
                ctypes.c_void_p,   # max_out u16 (band-local)
            ]
        lib.ser_recon_f64.restype = ctypes.c_int
        lib.ser_recon_f64.argtypes = [
            ctypes.c_void_p,   # src
            ctypes.c_int64,    # frame_stride (bytes)
            ctypes.c_uint32,   # frame_count
            ctypes.c_int,      # is_u16
            ctypes.c_int,      # upscale
            ctypes.c_void_p,   # flat_l (S, ih) int64
            ctypes.c_int64,    # right_off (elements)
            ctypes.c_void_p,   # w_l (ih,) f64
            ctypes.c_void_p,   # w_r (ih,) f64
            ctypes.c_uint32,   # S
            ctypes.c_uint32,   # ih
            ctypes.c_void_p,   # out (S, ih, F_total) u16, at this chunk's col
            ctypes.c_int64,    # out_stride (elements, = F_total)
            ctypes.c_int,      # do_prefetch
        ]
        _warp_args = [
            ctypes.c_void_p,   # src
            ctypes.c_int64,    # h
            ctypes.c_int64,    # w_in
            ctypes.c_void_p,   # mat3 (9,) f64 row-major
            ctypes.c_int64,    # out_h
            ctypes.c_int64,    # out_w
            ctypes.c_float,    # cval
            ctypes.c_void_p,   # out (out_h, out_w) u16
        ]
        lib.warp_f32_u16.restype = ctypes.c_int
        lib.warp_f32_u16.argtypes = _warp_args
        lib.warp_u16_u16.restype = ctypes.c_int
        lib.warp_u16_u16.argtypes = _warp_args
        lib.warp_u16_u16_batch.restype = ctypes.c_int
        lib.warp_u16_u16_batch.argtypes = [
            ctypes.c_void_p,   # srcs (K,) pointer array
            ctypes.c_int64,    # k
            ctypes.c_int64,    # h
            ctypes.c_int64,    # w_in
            ctypes.c_void_p,   # mat3 (9,) f64 row-major
            ctypes.c_int64,    # out_h
            ctypes.c_int64,    # out_w
            ctypes.c_void_p,   # cvals (K,) f32
            ctypes.c_void_p,   # outs (K,) pointer array
        ]
        if hasattr(lib, "row_medstats_f32"):
            lib.row_medstats_f32.restype = ctypes.c_int
            lib.row_medstats_f32.argtypes = [
                ctypes.c_void_p,   # rat (R, W) f32
                ctypes.c_int64,    # R
                ctypes.c_int64,    # W
                ctypes.c_void_p,   # row_ok (R,) u8
                ctypes.c_void_p,   # x_lo (R,) i32
                ctypes.c_void_p,   # x_hi (R,) i32
                ctypes.c_void_p,   # value_out (R, W) f32
                ctypes.c_void_p,   # nk_out (R,) i64
            ]
        if hasattr(lib, "row_medstats_sorted_f32"):
            lib.mask_interval_f32.restype = ctypes.c_int
            lib.mask_interval_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.row_medstats_sorted_f32.restype = ctypes.c_int
            lib.row_medstats_sorted_f32.argtypes = [
                ctypes.c_void_p,   # sorted masked rows (R, W) f32
                ctypes.c_void_p,   # rat (R, W) f32
                ctypes.c_int64,    # R
                ctypes.c_int64,    # W
                ctypes.c_void_p,   # row_ok (R,) u8
                ctypes.c_void_p,   # x_lo (R,) i32
                ctypes.c_void_p,   # x_hi (R,) i32
                ctypes.c_void_p,   # value_out (R, W) f32
                ctypes.c_void_p,   # nk_out (R,) i64
            ]
        if hasattr(lib, "gain_hist_u16"):
            lib.gain_hist_u16.restype = ctypes.c_int
            lib.gain_hist_u16.argtypes = [
                ctypes.c_void_p,   # src (H, W) u16
                ctypes.c_int64,    # h
                ctypes.c_int64,    # w
                ctypes.c_void_p,   # gain (H,) f32
                ctypes.c_void_p,   # out (H, W) u16
                ctypes.c_void_p,   # hist u32[65536] or NULL
            ]
            lib.hist_u16.restype = ctypes.c_int
            lib.hist_u16.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.lut_u16.restype = ctypes.c_int
            lib.lut_u16.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
        if hasattr(lib, "box_blur_u16_exact"):
            lib.box_blur_u16_exact.restype = ctypes.c_int
            lib.box_blur_u16_exact.argtypes = [
                ctypes.c_void_p,   # src (H, W) u16
                ctypes.c_int64,    # h
                ctypes.c_int64,    # w
                ctypes.c_int,      # kx
                ctypes.c_int,      # ky
                ctypes.c_void_p,   # out f32 (H, W) or NULL
                ctypes.c_void_p,   # out u16 (H, W) or NULL
            ]
        if hasattr(lib, "fits_pack_u16"):
            lib.fits_pack_u16.restype = ctypes.c_int
            lib.fits_pack_u16.argtypes = [
                ctypes.c_void_p,   # src u16
                ctypes.c_int64,    # n elements
                ctypes.c_void_p,   # out u16 (big-endian payload)
            ]
        if hasattr(lib, "png_pack_rows"):
            lib.png_pack_rows.restype = ctypes.c_int
            lib.png_pack_rows.argtypes = [
                ctypes.c_void_p,   # src (n, w) u16/u8
                ctypes.c_int64,    # n_rows
                ctypes.c_int64,    # w
                ctypes.c_int,      # is16
                ctypes.c_void_p,   # out n*(1+bpp*w) u8
            ]
        if hasattr(lib, "png_encode_stored_band"):
            lib.png_encode_stored_band.restype = ctypes.c_int64
            lib.png_encode_stored_band.argtypes = [
                ctypes.c_void_p,   # src (n, w) u16/u8
                ctypes.c_int64,    # n_rows
                ctypes.c_int64,    # w
                ctypes.c_int,      # is16
                ctypes.c_int,      # first (zlib header)
                ctypes.c_int,      # final (BFINAL + adler trailer)
                ctypes.c_uint32,   # adler_in
                ctypes.c_uint32,   # crc_in
                ctypes.c_void_p,   # out buffer
                ctypes.POINTER(ctypes.c_uint32),  # adler_out
                ctypes.POINTER(ctypes.c_uint32),  # crc_out
            ]
        if hasattr(lib, "clahe_u16"):
            lib.clahe_u16.restype = ctypes.c_int
            lib.clahe_u16.argtypes = [
                ctypes.c_void_p,   # src (H, W) u16
                ctypes.c_int64,    # h
                ctypes.c_int64,    # w
                ctypes.c_int,      # tiles_x
                ctypes.c_int,      # tiles_y
                ctypes.c_double,   # clip_limit
                ctypes.c_void_p,   # out (H, W) u16
                ctypes.c_void_p,   # out_hist u32[65536] or NULL
            ]
        _lib = lib
        return _lib


def native_gain_hist_u16(src: np.ndarray, gain: np.ndarray,
                         want_hist: bool = True):
    """(clip(src * gain[row]) -> u16, value histogram) in ONE image pass
    (native/ser_io.cpp:gain_hist_u16), value-exact vs the numpy form in
    pipeline/products._products_core_gained_host.  None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gain_hist_u16"):
        return None
    if src.dtype != np.uint16 or src.ndim != 2:
        return None
    src = np.ascontiguousarray(src)
    gain = np.ascontiguousarray(gain, dtype=np.float32)
    h, w = src.shape
    if gain.shape != (h,):
        return None
    out = np.empty_like(src)
    hist = np.empty(65536, dtype=np.uint32) if want_hist else None
    rc = lib.gain_hist_u16(
        src.ctypes.data_as(ctypes.c_void_p), h, w,
        gain.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p) if want_hist else None,
    )
    if rc != 0:
        return None
    return out, hist


def native_clahe_u16(img: np.ndarray, clip_limit: float = 0.8,
                     tiles=(2, 2), want_hist: bool = False):
    """cv2-exact CLAHE on a u16 image (native/ser_io.cpp:clahe_u16).

    Bit-identical to ``cv2.createCLAHE(clipLimit=clip_limit,
    tileGridSize=tiles).apply(img)`` (reference solex_util.py:532-533) —
    fuzz-asserted in tests/test_clahe.py.  With ``want_hist`` the OUTPUT
    value histogram accumulates in the same pass (the product stage's
    percentile stretch consumes it).  Returns ``out`` or ``(out, hist)``,
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "clahe_u16"):
        return None
    if img.dtype != np.uint16 or img.ndim != 2:
        return None
    h, w = img.shape
    tx, ty = int(tiles[0]), int(tiles[1])
    if h < 2 or w < 2 or tx < 1 or ty < 1:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty_like(img)
    hist = np.empty(65536, dtype=np.uint32) if want_hist else None
    rc = lib.clahe_u16(
        img.ctypes.data_as(ctypes.c_void_p), h, w, tx, ty,
        float(clip_limit),
        out.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p) if want_hist else None,
    )
    if rc != 0:
        return None
    return (out, hist) if want_hist else out


def native_hist_u16(img: np.ndarray):
    """np.bincount(img.ravel(), minlength=65536) twin (u16 input) -> u32
    counts, or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "hist_u16"):
        return None
    if img.dtype != np.uint16:
        return None
    img = np.ascontiguousarray(img)
    hist = np.empty(65536, dtype=np.uint32)
    rc = lib.hist_u16(img.ctypes.data_as(ctypes.c_void_p), img.size,
                      hist.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return hist


def native_box_blur_u16(img: np.ndarray, kx: int, ky: int,
                        want: str = "f32"):
    """Exact box blur of a u16 image (ops/blur host-twin, one C pass).

    ``want`` is 'f32' (box_blur_host twin) or 'u16' (box_blur_u16_host
    twin).  Returns None when the library is unavailable or the kernel
    pad does not fit inside the image (multi-bounce reflection -> numpy).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "box_blur_u16_exact"):
        return None
    if img.dtype != np.uint16 or img.ndim != 2:
        return None
    h, w = img.shape
    if kx < 1 or ky < 1 or kx // 2 > w - 1 or (kx - 1 - kx // 2) > w - 1 \
            or ky // 2 > h - 1 or (ky - 1 - ky // 2) > h - 1:
        return None
    if kx * ky > 32767:
        # 65535 * kx * ky would overflow the int32 window sums; the numpy
        # twin wraps identically to the device program there, while C's
        # trunc-vs-floor division would diverge — keep that case on numpy
        return None
    img = np.ascontiguousarray(img)
    out_f = np.empty((h, w), np.float32) if want == "f32" else None
    out_u = np.empty((h, w), np.uint16) if want == "u16" else None
    rc = lib.box_blur_u16_exact(
        img.ctypes.data_as(ctypes.c_void_p), h, w, int(kx), int(ky),
        out_f.ctypes.data_as(ctypes.c_void_p) if out_f is not None else None,
        out_u.ctypes.data_as(ctypes.c_void_p) if out_u is not None else None,
    )
    if rc != 0:
        return None
    return out_f if out_f is not None else out_u


def native_lut_u16(img: np.ndarray, lut: np.ndarray):
    """lut[img] gather (u16 value LUT), or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lut_u16"):
        return None
    if img.dtype != np.uint16 or lut.dtype != np.uint16 or lut.size != 65536:
        return None
    img = np.ascontiguousarray(img)
    lut = np.ascontiguousarray(lut)
    out = np.empty_like(img)
    rc = lib.lut_u16(img.ctypes.data_as(ctypes.c_void_p), img.size,
                     lut.ctypes.data_as(ctypes.c_void_p),
                     out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def native_row_medstats(
    rat: np.ndarray, row_ok: np.ndarray, x_lo: np.ndarray, x_hi: np.ndarray
):
    """Masked row median/MAD clip of pipeline/transversalium's row stats:
    returns (value (R, W) f32 — kept ? rat : 0 — and nk (R,) i64), or None
    when the native lib is unavailable.  numpy-EXACT selection semantics;
    the caller finishes with numpy's own pairwise sum so the result is
    bit-identical to the pure-numpy twin.

    Prefers the sorted hybrid (native/ser_io.cpp:row_medstats_sorted_f32):
    numpy's AVX-512 row sort + a native consume pass beat the standalone
    radix kernel ~1.5x on the bench shape; the radix variant remains the
    numpy-free fallback.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "row_medstats_f32"):
        return None
    rat = np.ascontiguousarray(rat, dtype=np.float32)
    R, W = rat.shape
    row_ok = np.ascontiguousarray(row_ok, dtype=np.uint8)
    x_lo = np.ascontiguousarray(x_lo, dtype=np.int32)
    x_hi = np.ascontiguousarray(x_hi, dtype=np.int32)
    if row_ok.shape != (R,) or x_lo.shape != (R,) or x_hi.shape != (R,):
        return None
    value = np.empty((R, W), dtype=np.float32)
    nk = np.empty(R, dtype=np.int64)
    if (hasattr(lib, "row_medstats_sorted_f32")
            and os.environ.get("SOLEX_ROWSTATS_RADIX") != "1"):
        # one native pass builds the masked rows (valid segment copied,
        # rest +inf), then numpy sorts them IN PLACE — no boolean mask, no
        # where temp, no sort copy
        srt = np.empty_like(rat)
        lib.mask_interval_f32(
            rat.ctypes.data_as(ctypes.c_void_p), R, W,
            row_ok.ctypes.data_as(ctypes.c_void_p),
            x_lo.ctypes.data_as(ctypes.c_void_p),
            x_hi.ctypes.data_as(ctypes.c_void_p),
            srt.ctypes.data_as(ctypes.c_void_p),
        )
        srt.sort(axis=1)
        rc = lib.row_medstats_sorted_f32(
            srt.ctypes.data_as(ctypes.c_void_p),
            rat.ctypes.data_as(ctypes.c_void_p), R, W,
            row_ok.ctypes.data_as(ctypes.c_void_p),
            x_lo.ctypes.data_as(ctypes.c_void_p),
            x_hi.ctypes.data_as(ctypes.c_void_p),
            value.ctypes.data_as(ctypes.c_void_p),
            nk.ctypes.data_as(ctypes.c_void_p),
        )
        if rc == 0:
            return value, nk
    rc = lib.row_medstats_f32(
        rat.ctypes.data_as(ctypes.c_void_p), R, W,
        row_ok.ctypes.data_as(ctypes.c_void_p),
        x_lo.ctypes.data_as(ctypes.c_void_p),
        x_hi.ctypes.data_as(ctypes.c_void_p),
        value.ctypes.data_as(ctypes.c_void_p),
        nk.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return value, nk


def native_warp_u16(
    image: np.ndarray, mat3: np.ndarray, out_h: int, out_w: int, cval: float,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Host projective bilinear warp -> uint16, BIT-identical to the numpy
    twin (ops/warp.py:warp_projective_host + warp_to_u16_host) at ~1/10 the
    memory traffic (native/ser_io.cpp:warp_body).  ``image`` is float32
    [0,1) or uint16 (converted /65536 in the kernel).  ``out`` lets a
    batched caller write straight into a preallocated (out_h, out_w)
    uint16 view (e.g. one row of a (K, H, W) stack) instead of paying a
    stack copy afterwards.  Returns None when the native library is
    unavailable — the caller falls back to the twin.
    """
    lib = get_lib()
    if lib is None:
        return None
    h, w_in = image.shape
    m = np.ascontiguousarray(mat3, dtype=np.float64)
    if out is None:
        out = np.empty((int(out_h), int(out_w)), np.uint16)
    else:
        assert (out.shape == (int(out_h), int(out_w))
                and out.dtype == np.uint16 and out.flags.c_contiguous)
    if image.dtype == np.uint16:
        fn = lib.warp_u16_u16
        src = np.ascontiguousarray(image)
    else:
        fn = lib.warp_f32_u16
        src = np.ascontiguousarray(image, dtype=np.float32)
    rc = fn(
        src.ctypes.data_as(ctypes.c_void_p),
        h,
        w_in,
        m.ctypes.data_as(ctypes.c_void_p),
        int(out_h),
        int(out_w),
        float(cval),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out


def native_warp_u16_batch(
    images, mat3: np.ndarray, out_h: int, out_w: int, cvals,
    out: np.ndarray,
) -> bool:
    """Warp K uint16 images sharing ONE matrix into ``out`` (K, H', W').

    The per-pixel coordinate math is computed once per output row and
    reused across the K sources (native/ser_io.cpp:warp_body_batch_u16),
    so a Doppler sweep pays it once instead of K times; each output plane
    is BIT-identical to K independent native_warp_u16 calls.  ``images``
    is a sequence of K (h, w) C-contiguous uint16 arrays (uniform shape);
    ``cvals`` one [0,1)-scale fill per image.  Returns False when the
    native library is unavailable (caller falls back to the per-image
    path).
    """
    lib = get_lib()
    if lib is None:
        return False
    k = len(images)
    h, w_in = images[0].shape
    # Validation must survive `python -O` (asserts vanish there, and a
    # mismatched buffer would send wrong-sized pointers into the native
    # kernel): return False so the caller takes the per-image path, and
    # reject non-uint16 inputs outright instead of silently value-casting
    # floats to near-zero uint16.
    if any(im.dtype != np.uint16 or im.shape != (h, w_in) for im in images):
        return False
    srcs = [np.ascontiguousarray(im) for im in images]
    if (out.shape != (k, int(out_h), int(out_w))
            or out.dtype != np.uint16 or not out.flags.c_contiguous):
        return False
    m = np.ascontiguousarray(mat3, dtype=np.float64)
    cv = np.ascontiguousarray(cvals, dtype=np.float32)
    PtrArr = ctypes.c_void_p * k
    src_ptrs = PtrArr(*[s.ctypes.data_as(ctypes.c_void_p).value for s in srcs])
    out_ptrs = PtrArr(*[
        out[i].ctypes.data_as(ctypes.c_void_p).value for i in range(k)
    ])
    rc = lib.warp_u16_u16_batch(
        ctypes.cast(src_ptrs, ctypes.c_void_p),
        k,
        h,
        w_in,
        m.ctypes.data_as(ctypes.c_void_p),
        int(out_h),
        int(out_w),
        cv.ctypes.data_as(ctypes.c_void_p),
        ctypes.cast(out_ptrs, ctypes.c_void_p),
    )
    return rc == 0


def native_recon_chunk(
    src: np.ndarray,
    flat_l: np.ndarray,
    right_off: int,
    w_l: np.ndarray,
    w_r: np.ndarray,
    upscale: bool,
    out: np.ndarray,
    start: int,
    do_prefetch: bool = False,
) -> bool:
    """Fused pass-B gather loop over one chunk of frames (native).

    ``src``: (n, ...) frames, contiguous per frame (memmap slice or band
    slab), u8/u16; ``flat_l``: (S, ih) int64 flattened per-frame element
    indices; ``out``: the full (S, ih, F_total) uint16 disk cube —
    columns [start, start+n) are written.  Returns False when the native
    library is unavailable (caller falls back to the numpy loop).
    Bit-exact to io/hostreduce.py's numpy path (see native/ser_io.cpp).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "ser_recon_f64"):
        return False
    n = src.shape[0]
    S, ih = flat_l.shape
    F_total = out.shape[2]
    # -O-proof validation: a mismatched buffer must route to the numpy
    # fallback, never reach the native kernel with wrong-sized pointers.
    if out.dtype != np.uint16 or not out.flags.c_contiguous:
        return False
    frame_stride = src.strides[0]
    # per-frame contiguity: gather indices address the frame viewed flat
    if src.strides[-1] != src.itemsize:
        return False
    base = src.ctypes.data if src.flags.c_contiguous or src.ndim == 1 else None
    if base is None:
        # memmap slices along axis 0 stay contiguous; anything else bails
        if not src[0].flags.c_contiguous:
            return False
        base = src.ctypes.data
    flat_l = np.ascontiguousarray(flat_l, dtype=np.int64)
    w_l = np.ascontiguousarray(w_l, dtype=np.float64)
    w_r = np.ascontiguousarray(w_r, dtype=np.float64)
    out_ptr = out.ctypes.data + start * out.itemsize
    rc = lib.ser_recon_f64(
        ctypes.c_void_p(base),
        ctypes.c_int64(frame_stride),
        ctypes.c_uint32(n),
        ctypes.c_int(1 if src.itemsize == 2 else 0),
        ctypes.c_int(1 if upscale else 0),
        flat_l.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(right_off),
        w_l.ctypes.data_as(ctypes.c_void_p),
        w_r.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_uint32(S),
        ctypes.c_uint32(ih),
        ctypes.c_void_p(out_ptr),
        ctypes.c_int64(F_total),
        ctypes.c_int(1 if do_prefetch else 0),
    )
    return rc == 0


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

    def sample_stats(self, step: int):
        """Full-frame (sum u64, max u16) over every ``step``-th frame only.

        The cheap leg of the two-step pass A (native/ser_io.cpp:
        ser_sample_stats): locates the spectral band and the sun's
        vertical extent from ~F/step frames before ser_band_stats touches
        only the band at full frame count.  Returns (sum, max, n_frames).
        """
        if not hasattr(self._lib, "ser_sample_stats"):
            raise RuntimeError("native library lacks ser_sample_stats")
        s = np.zeros((self.Height, self.Width), dtype=np.uint64)
        m = np.zeros((self.Height, self.Width), dtype=np.uint16)
        n = self._lib.ser_sample_stats(
            self._h, int(step),
            s.ctypes.data_as(ctypes.c_void_p),
            m.ctypes.data_as(ctypes.c_void_p),
        )
        if n < 0:
            raise RuntimeError(f"ser_sample_stats failed ({n})")
        return s, m, int(n)

    def band_stats(self, r0: int, r1: int, c0: int, c1: int):
        """All-frames (sum u64, max u16) restricted to the raw rectangle
        rows [r0, r1) x cols [c0, c1) — band-local layout (r1-r0, c1-c0).

        Reads only the band bytes of every frame (native/ser_io.cpp:
        ser_band_stats), so pass A costs band_bytes/scan_bytes of a full
        sweep when the downstream fit verifies the band covered the line
        (io/hostreduce.py:fast_passa).
        """
        if not hasattr(self._lib, "ser_band_stats"):
            raise RuntimeError("native library lacks ser_band_stats")
        s = np.zeros((r1 - r0, c1 - c0), dtype=np.uint64)
        m = np.zeros((r1 - r0, c1 - c0), dtype=np.uint16)
        rc = self._lib.ser_band_stats(
            self._h, int(r0), int(r1), int(c0), int(c1),
            s.ctypes.data_as(ctypes.c_void_p),
            m.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"ser_band_stats failed ({rc})")
        return s, m

    def close(self) -> None:
        if getattr(self, "_h", None) is not None:
            self._lib.ser_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def native_png_pack(rows: np.ndarray):
    """PNG scanline pack ([filter 0][big-endian samples] per row) of a
    2-D u16/u8 host image — bit-identical to io/png.py's numpy pack (the
    shared framing around it guarantees identical files either way).
    Returns the flat uint8 payload, or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "png_pack_rows"):
        return None
    if rows.ndim != 2 or rows.dtype not in (np.uint16, np.uint8):
        return None
    rows = np.ascontiguousarray(rows)
    n, w = rows.shape
    is16 = 1 if rows.dtype == np.uint16 else 0
    out = np.empty(n * (1 + (2 if is16 else 1) * w), dtype=np.uint8)
    rc = lib.png_pack_rows(
        rows.ctypes.data_as(ctypes.c_void_p), n, w, is16,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out


def native_png_encode_band(rows: np.ndarray, first: bool, final: bool,
                           adler: int, crc: int):
    """One PNG IDAT band fully framed in a single native pass: scanline
    pack + zlib stored-block headers + running adler32 + chunk crc32
    (ser_io.cpp:png_encode_stored_band), byte-identical to io/png.py's
    python composition.  Returns (chunk_body bytes-view, adler', crc'),
    or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "png_encode_stored_band"):
        return None
    if rows.ndim != 2 or rows.dtype not in (np.uint16, np.uint8):
        return None
    rows = np.ascontiguousarray(rows)
    n, w = rows.shape
    is16 = 1 if rows.dtype == np.uint16 else 0
    payload = n * (1 + (2 if is16 else 1) * w)
    cap = (2 if first else 0) + payload + 5 * ((payload + 65534) // 65535) \
        + (4 if final else 0)
    out = np.empty(max(cap, 1), dtype=np.uint8)
    a_out = ctypes.c_uint32(0)
    c_out = ctypes.c_uint32(0)
    total = lib.png_encode_stored_band(
        rows.ctypes.data_as(ctypes.c_void_p), n, w, is16,
        1 if first else 0, 1 if final else 0,
        ctypes.c_uint32(adler & 0xFFFFFFFF), ctypes.c_uint32(crc & 0xFFFFFFFF),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(a_out), ctypes.byref(c_out),
    )
    if total < 0:
        return None
    return out[:total], a_out.value, c_out.value


def native_fits_pack_u16(data: np.ndarray):
    """One-pass BITPIX=16/BZERO=32768 payload (xor-offset + byteswap,
    ser_io.cpp:fits_pack_u16) — value-identical to the numpy two-pass
    form in io/fits.py.  None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fits_pack_u16"):
        return None
    if data.dtype != np.uint16:
        return None
    data = np.ascontiguousarray(data)
    out = np.empty(data.size, dtype=np.uint16)
    rc = lib.fits_pack_u16(
        data.ctypes.data_as(ctypes.c_void_p), data.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return out
