"""Final image products: CLAHE / stretches / protus / crop / rotate / saves.

reference: solex_util.py:519-588 (image_process, rescale_brightness) and
Solex_recon.py:155-171 (fixed-width / square crop).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Options, output_path
from ..io.fits import write_fits
from ..io.png import write_png_streaming


def _save_png_sync(path: str, img) -> None:
    # one encoder for BOTH residencies: identical pixels must give
    # identical bytes whether a product came back as a device array or
    # stayed numpy (the host-pipeline mode mixes the two across the
    # sequential and batched sweep paths; tests/test_sweep_batched.py
    # asserts byte-identical files)
    write_png_streaming(path, img)


def _save_png(path: str, img) -> None:
    """PNG write, queued on the writer pool (io/writers.py) so the four
    product PNGs overlap each other's pulls/encodes; each write still
    overlaps its own device->host pull with the encode via io/png.py's
    banded streaming writer.  pipeline/run.py joins the pool before
    returning."""
    from ..io.writers import submit

    submit(_save_png_sync, path, img)



try:
    import cv2  # exact protus disc rasterisation parity

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

Circle = Tuple[float, float, float]
NO_CIRCLE: Circle = (-1, -1, -1)


def crop_width(img: np.ndarray, circle: Circle, options: Options):
    """Crop/pad to fixed width or square, centred on the disk.

    reference: Solex_recon.py:155-171 — pads with the corner pixel value,
    recentres the circle x to the new centre.
    """
    if options.fixed_width is None and not options.crop_width_square:
        return img, circle
    h, w = img.shape
    nw = h if options.fixed_width is None else options.fixed_width
    nw2 = nw // 2
    cx = w // 2 if circle == NO_CIRCLE else int(circle[0])
    tx = nw2 - cx
    fill = img[0, 0]
    new_img = np.full((h, nw), fill, dtype=img.dtype)
    src_lo, src_hi = max(0, cx - nw2), min(cx + nw2, w)
    new_img[:, : src_hi - src_lo] = img[:, src_lo:src_hi]
    if tx > 0:
        new_img = np.roll(new_img, tx, axis=1)
        new_img[:, :tx] = fill
    if circle != NO_CIRCLE:
        circle = (nw2, circle[1], circle[2])
    return new_img, circle


def _protus_disc(img: np.ndarray, x0: int, y0: int, r: int, value: int = 80) -> np.ndarray:
    if _HAVE_CV2:
        # cv2 needs a writable C-contiguous buffer (device arrays can
        # convert F-contiguous)
        out = np.ascontiguousarray(img).copy()
        return cv2.circle(out, (x0, y0), r, value, -1)
    ys, xs = np.ogrid[: img.shape[0], : img.shape[1]]
    mask = (xs - x0) ** 2 + (ys - y0) ** 2 <= r * r
    out = img.copy()
    out[mask] = value
    return out


import jax


def _products_body(fj: jnp.ndarray):
    """CLAHE + percentiles + the three stretches (traced helper).

    reference math: solex_util.py:532-541.  The percentiles come from
    exact value histograms (bit-identical to jnp.percentile for integer
    images — ops/clahe.py:percentile_from_hist) instead of full sorts;
    the input image's histogram falls out of CLAHE's tile histograms for
    free on unpadded grids.
    """
    from ..ops.clahe import _clahe, percentile_from_hist, value_histogram

    cl1, img_hist = _clahe(fj, 0.8, 2, 2, 65536, return_full_hist=True)
    cl1 = cl1.astype(jnp.uint16)
    if img_hist is None:  # odd-sized image: reflect padding taints the sum
        img_hist = value_histogram(fj, 65536)
    bright = jnp.maximum(
        percentile_from_hist(img_hist, fj.size, 99.9999), 1.0
    )
    dark_clahe = percentile_from_hist(value_histogram(cl1, 65536), cl1.size, 10.0)
    bright_clahe = jnp.maximum(jnp.max(cl1).astype(jnp.float32), dark_clahe + 1.0)

    def stretch(img, lo, hi):
        x = 65535.0 * (img.astype(jnp.float32) - lo) / (hi - lo)
        return jnp.clip(x, 0, 65535).astype(jnp.uint16)

    frame_hc = stretch(fj, bright * 0.25, bright)
    frame_protus = stretch(fj, 0.0, jnp.maximum(bright * 0.18, 1.0))
    cc = stretch(cl1, dark_clahe, bright_clahe)
    return cl1, cc, frame_hc, frame_protus


_products_core = jax.jit(_products_body)


def host_products_enabled() -> bool:
    """True when the product core should run as cv2/numpy host code.

    On a CPU-only jax backend the XLA product program is the wrong tool:
    its MXU-shaped CLAHE histograms (one-hot matmuls, great on TPU) cost
    ~2.4 s on this host where cv2's CLAHE + numpy percentiles do the same
    math in a few hundred ms — and the host forms match the REFERENCE
    exactly (cv2.createCLAHE, np.percentile: solex_util.py:532-541).
    Tests pin SOLEX_HOST_PRODUCTS=0 so the suite keeps exercising the
    XLA program on the CPU backend; the explicit-path equivalence test
    covers the pair.  SOLEX_HOST_PRODUCTS=1 forces the host core even
    with an accelerator attached — useful on throttled-link hosts where
    the product downloads cost more than the host math.
    """
    import os

    env = os.environ.get("SOLEX_HOST_PRODUCTS", "auto")
    if env == "0":
        return False
    if env != "1" and jax.default_backend() != "cpu":
        # an accelerator is attached — but when the feed policy already
        # chose the full host pass (throttled link), the disks are
        # host-side and host products keep the link idle entirely
        from ..utils.placement import host_pipeline

        if not host_pipeline():
            return False
    try:
        import cv2  # noqa: F401

        return True
    except Exception:
        return False


def _np_percentile_from_counts(counts: np.ndarray, n: int, q: float) -> float:
    """``float(np.percentile(img, q))`` twin from a uint16 value histogram.

    Replicates numpy's linear-interpolation quantile in float64 — the
    virtual index ``q/100 * (n-1)`` and the ``_lerp`` branch that switches
    to ``b - (b-a)*(1-t)`` at t >= 0.5 — on the two order statistics read
    from the histogram CDF.  Bit-identical to np.percentile for integer
    images (fuzz-tested in tests/test_host_products.py); the histogram
    costs one pass over the u16 image where np.percentile pays a float64
    cast + introselect (~4x slower on the 4.3 M-px product frames).
    """
    virtual = np.float64(q) / 100.0 * (n - 1)
    lo = int(np.floor(virtual))
    hi = int(np.ceil(virtual))
    c = np.cumsum(counts)
    a = np.float64(np.searchsorted(c, lo + 1, side="left"))
    b = np.float64(np.searchsorted(c, hi + 1, side="left"))
    t = np.float64(virtual - lo)
    if t >= 0.5:
        return float(b - (b - a) * (1.0 - t))
    return float(a + (b - a) * t)


def _stretch_lut(img: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """The reference's linear stretch (solex_util.py:532-541) as a uint16
    value LUT: the stretch depends only on the pixel value, so computing
    the float32 form once per possible value and gathering is bit-identical
    to the full-image float32 pass at a fraction of the memory traffic.
    The gather itself runs native when available (io/native.native_lut_u16,
    same indexed loads)."""
    from ..io.native import native_lut_u16

    vals = np.arange(65536, dtype=np.float32)
    x = 65535.0 * (vals - lo) / np.float32(hi - lo)
    lut = np.clip(x, 0, 65535).astype(np.uint16)
    if img.dtype == np.uint16:
        out = native_lut_u16(img, lut)
        if out is not None:
            return out
    return lut[img]


def _hist_u16(img: np.ndarray) -> np.ndarray:
    """np.bincount(img.ravel(), minlength=65536) with a native fast path."""
    from ..io.native import native_hist_u16

    if img.dtype == np.uint16:
        h = native_hist_u16(img)
        if h is not None:
            return h.astype(np.int64)
    return np.bincount(img.ravel(), minlength=65536)


def _products_body_host(f: np.ndarray, want=(True, True), hist_f=None):
    """cv2/numpy twin of ``_products_body`` (reference-exact forms).

    Output contract identical: (cl1, cc, high_contrast, protus), all
    uint16.  CLAHE is bit-identical to the device kernel (both match
    cv2); the stretch thresholds follow np.percentile — the reference's
    own call, evaluated exactly via value histograms — so they can differ
    from the device histogram-CDF percentiles by ≤1 LSB (docs/PARITY.md
    deviation 7).  The stretches run as value LUTs (bit-identical to the
    float32 image passes, see _stretch_lut).

    ``want`` = (high_contrast, protus): products nothing will consume
    (clahe_only save runs with no display, solex_util.py:556-566 writes
    only _clahe.png there) come back as None, skipping their LUT gathers
    AND the full-image brightness histogram both depend on.  The device
    program (`_products_body`) keeps computing all four — on TPU they
    fuse into the one pass and only downloads cost anything.
    """
    from ..io.native import native_clahe_u16

    f = np.ascontiguousarray(f, dtype=np.uint16)
    native = native_clahe_u16(f, 0.8, (2, 2), want_hist=True)
    if native is not None:
        # cv2-exact native CLAHE with the output value histogram folded
        # into the same pass (the percentile stretch consumes it)
        cl1, hist_u32 = native
        hist_c = hist_u32.astype(np.int64)
    else:
        import cv2

        cl1 = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(f)
        hist_c = _hist_u16(cl1)
    dark_clahe = _np_percentile_from_counts(hist_c, cl1.size, 10.0)
    cl1_max = float(65535 - int(np.argmax(hist_c[::-1] > 0)))
    bright_clahe = max(cl1_max, dark_clahe + 1.0)
    cc = _stretch_lut(cl1, dark_clahe, bright_clahe)

    want_hc, want_protus = want
    frame_hc = frame_protus = None
    if want_hc or want_protus:
        hist_f = _hist_u16(f) if hist_f is None else hist_f
        bright = max(_np_percentile_from_counts(hist_f, f.size, 99.9999), 1.0)
        if want_hc:
            frame_hc = _stretch_lut(f, bright * 0.25, bright)
        if want_protus:
            frame_protus = _stretch_lut(f, 0.0, max(bright * 0.18, 1.0))
    return cl1, cc, frame_hc, frame_protus


def _products_core_gained_host(f: np.ndarray, gain: np.ndarray,
                               want=(True, True)):
    from ..io.native import native_gain_hist_u16

    f = np.ascontiguousarray(f, dtype=np.uint16)
    want_hist = want[0] or want[1]
    native = native_gain_hist_u16(f, np.asarray(gain, np.float32),
                                  want_hist=want_hist)
    if native is not None:
        # fused multiply + histogram: the brightness histogram the
        # percentile stretches need falls out of the gain pass for free
        detrans, hist = native
        hist_f = hist.astype(np.int64) if hist is not None else None
        return (detrans,) + _products_body_host(detrans, want, hist_f=hist_f)
    out = f.astype(np.float32) * np.asarray(gain, np.float32)[:, None]
    detrans = np.clip(out, 0, 65535).astype(np.uint16)
    return (detrans,) + _products_body_host(detrans, want)


@jax.jit
def _products_core_gained(fj: jnp.ndarray, gain: jnp.ndarray):
    """Transversalium row-gain multiply fused INTO the product program.

    One device dispatch instead of two (apply_row_gain + products) — the
    relay's per-dispatch latency is a real cost on this host.  The gain
    step is bit-identical to ops/rowstats.apply_row_gain (float32 multiply,
    clip, uint16 cast — reference solex_util.py:489,515-516); the returned
    ``detrans`` lets callers that persist the intermediate reuse this
    program's output instead of re-dispatching.
    """
    out = fj.astype(jnp.float32) * gain.astype(jnp.float32)[:, None]
    detrans = jnp.clip(out, 0, 65535).astype(jnp.uint16)
    return (detrans,) + _products_body(detrans)


def products_core_batched(stack, gains=None, want=(True, True)):
    """(K, H, W) uint16 stack -> the product stacks in ONE vmapped device
    program (Doppler sweeps share geometry, so per-shift percentile
    + CLAHE + stretches batch cleanly; reference runs them sequentially
    per shift, Solex_recon.py:105-133).

    With ``gains`` (K, H) the transversalium row multiply is fused in and
    the return gains a leading ``detrans`` stack (see _products_core_gained).
    ``want`` = (high_contrast, protus) skips unconsumed stretch products on
    the HOST core only (see _products_body_host); the vmapped device
    program always computes all four.
    """
    if host_products_enabled():
        stack = np.asarray(stack)
        if gains is not None:
            outs = [_products_core_gained_host(f, g, want)
                    for f, g in zip(stack, np.asarray(gains))]
        else:
            outs = [_products_body_host(f, want) for f in stack]
        # lists, not np.stack: consumers index per shift, and stacking
        # K full-size uint16 products costs ~45 ms of pure copy each on
        # the single host core (np.asarray(col) recovers an array)
        return tuple(list(col) for col in zip(*outs))
    if gains is not None:
        return jax.vmap(_products_core_gained)(
            jnp.asarray(stack), jnp.asarray(gains, dtype=jnp.float32)
        )
    return jax.vmap(_products_core)(jnp.asarray(stack))


def needed_products(options, save: bool = True):
    """(high_contrast, protus) consumption gates for one image_process call.

    Mirrors the save gates (solex_util.py:556-566 semantics), the display,
    and the (cc, protus) return contract used by library callers (analyser
    preview/save pass save=False).  Shared by image_process and the
    Doppler-sweep batcher so a core that skipped a product is never asked
    to save it.
    """
    protus_needed = (
        not save
        or (not options._nolog and
            (options.protus_only or not options.clahe_only))
        or options.flag_display
    )
    hc_needed = options.flag_display or (
        save and not options._nolog
        and not options.clahe_only and not options.protus_only
    )
    return (hc_needed, protus_needed)


def image_process(
    frame: np.ndarray,
    circle: Circle,
    options: Options,
    header: Optional[Dict] = None,
    basefich: str = "",
    save: bool = True,
    core_out=None,
    gain: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """CLAHE + stretches + protus + rotation + product files.

    reference: solex_util.py:527-588.  Returns (clahe_image, protus_image)
    after rotation, both uint16 — protus_image is None on host-core runs
    where nothing consumes it (a clahe_only save with no display; the
    reference computes it there too but discards it unsaved).  ``core_out`` lets a Doppler-sweep caller
    pass precomputed (cl1, cc, hc, protus) from ONE vmapped device program
    over the whole shift stack (pipeline/run.py) instead of K sequential
    programs.  ``gain`` (H,) fuses the transversalium row multiply into the
    product program (single_image_process's fast path) — ``frame`` is then
    the PRE-transversalium image.
    """
    # device-resident until a consumer (file write / disc paint / display)
    # actually needs host bytes — per-product downloads dominate on
    # slow-link hosts otherwise.  CPU-only backends take the cv2/numpy
    # twin instead (host_products_enabled): same outputs, ~5x faster
    # where there is no MXU to shape the programs for.
    host_core = core_out is None and host_products_enabled()
    want = needed_products(options, save)
    hc_needed, protus_needed = want
    xp = np if host_core else jnp
    fj = xp.asarray(frame)
    if not jnp.issubdtype(fj.dtype, jnp.integer):
        # float input (de-vignette path): clip to the uint16 range before
        # the cast so the result is identical for host and device inputs.
        # Deliberate deviation: the reference's numpy cast WRAPS >65535
        # values (solex_util.py:528) — saturation is the sane behaviour;
        # see docs/PARITY.md.
        fj = xp.clip(fj, 0, 65535)
    fj = fj.astype(xp.uint16)
    if gain is not None and core_out is None:
        if host_core:
            fj, cl1, cc, frame_hc, frame_protus = _products_core_gained_host(
                fj, gain, want
            )
        else:
            fj, cl1, cc, frame_hc, frame_protus = _products_core_gained(
                fj, jnp.asarray(gain, dtype=jnp.float32)
            )
    elif core_out is not None:
        cl1, cc, frame_hc, frame_protus = core_out
    elif host_core:
        cl1, cc, frame_hc, frame_protus = _products_body_host(fj, want)
    else:
        cl1, cc, frame_hc, frame_protus = _products_core(fj)
    frame_raw = fj

    # the protus disc is only painted (a host round trip on device paths)
    # when something will consume it — a file write or the live display;
    # reference reaches image_process unconditionally but clahe_only saves
    # no protus png (solex_util.py:556-566)
    if protus_needed and circle != NO_CIRCLE and options.disk_display:
        x0, y0 = int(circle[0]), int(circle[1])
        r = int(circle[2]) + options.delta_radius
        if r > 0:
            # the disc is painted on host (cv2); KEEP it host-side — the
            # image's only remaining consumers (rot90 + PNG encode/display)
            # run fine on numpy, so re-uploading just to rot90 on device
            # and download again would cost two extra link trips
            frame_protus = _protus_disc(np.asarray(frame_protus), x0, y0, r)

    k = options.img_rotate // 90

    def _rot(a):
        if isinstance(a, np.ndarray):
            return np.rot90(a, k)
        return jnp.rot90(a, k, axes=(0, 1))

    if k:
        frame_raw = _rot(frame_raw)
        frame_hc = _rot(frame_hc) if frame_hc is not None else None
        frame_protus = (
            _rot(frame_protus) if frame_protus is not None else None
        )
        cc = _rot(cc)

    if save and not options._nolog:
        if options.clahe_only or not options.protus_only:
            _save_png(output_path(basefich + "_clahe.png", options), cc)
        if options.protus_only or not options.clahe_only:
            _save_png(
                output_path(basefich + "_protus.png", options), frame_protus
            )
        if not options.clahe_only and not options.protus_only:
            _save_png(
                output_path(basefich + "_uncontrasted.png", options), frame_raw
            )
            _save_png(
                output_path(basefich + "_high_contrast.png", options), frame_hc
            )
    if options.flag_display:
        from ..utils.display import show_products

        show_products(
            np.asarray(cc), np.asarray(frame_hc), np.asarray(frame_protus),
            tempo_ms=options.tempo,
        )
    if save and options.save_fit:
        from ..io.writers import submit

        submit(
            write_fits, output_path(basefich + "_clahe.fits", options),
            cl1, header,
        )
    # device arrays pass through — callers pull host bytes on demand, so a
    # clahe_only run never pays the protus download
    return cc, frame_protus
