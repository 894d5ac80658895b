"""PNG (and general image) I/O for the final products.

The reference writes 16-bit PNGs with cv2.imwrite at compression 0
(solex_util.py:556-566).  We use cv2 when present (identical bytes semantics)
and fall back to PIL; both support 16-bit grayscale PNG.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

try:
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def write_png(path: str, img: np.ndarray, compression: int = 0) -> None:
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        img = np.clip(img, 0, 65535).astype(np.uint16)
    if _HAVE_CV2:
        cv2.imwrite(path, img, [cv2.IMWRITE_PNG_COMPRESSION, compression])
        return
    if _HAVE_PIL:
        mode = "I;16" if img.dtype == np.uint16 else "L"
        Image.fromarray(img, mode=mode).save(path)
        return
    write_png_streaming(path, img, compression=compression)


def _png_chunk(f, tag: bytes, data: bytes) -> None:
    import struct
    import zlib

    f.write(struct.pack(">I", len(data)))
    f.write(tag)
    f.write(data)
    f.write(struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png_chunk_parts(f, tag: bytes, parts) -> None:
    """One PNG chunk assembled from buffer pieces without a joining copy
    (the length prefix and running CRC are computed over the pieces)."""
    import struct
    import zlib

    f.write(struct.pack(">I", sum(len(p) for p in parts)))
    f.write(tag)
    crc = zlib.crc32(tag)
    for p in parts:
        f.write(p)
        crc = zlib.crc32(p, crc)
    f.write(struct.pack(">I", crc & 0xFFFFFFFF))


def _pack_scanlines(rows: np.ndarray, be: str) -> np.ndarray:
    """Flat uint8 scanline payload: [filter 0][big-endian samples] per row.

    Native fast path (ser_io.cpp:png_pack_rows) when available — BIT-
    identical to the numpy form below by construction, so files match
    whichever side packs."""
    if rows.dtype in (np.uint16, np.uint8):
        from .native import native_png_pack

        out = native_png_pack(rows)
        if out is not None:
            return out
    n, _ = rows.shape
    line_bytes = (
        rows.astype(be, copy=False, order="C").view(np.uint8).reshape(n, -1)
    )
    raw = np.empty((n, 1 + line_bytes.shape[1]), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = line_bytes
    return raw.reshape(-1)


def _stored_parts(payload, first: bool, final: bool, adler: int):
    """zlib stored-block framing pieces for one band's scanline payload.

    Deterministic by construction (blocks split at exactly 65535 bytes,
    never carried across bands; BFINAL on the image's last block; the
    stream header on the first band and the adler32 trailer after the
    final block), so the SAME bytes come out of the python and native
    pack paths and of host- and device-resident writes alike."""
    import struct

    mv = memoryview(payload)
    n = len(mv)
    parts = []
    if first:
        parts.append(b"\x78\x01")  # 32K window, fastest-compression hint
    pos = 0
    while True:
        blk = min(65535, n - pos)
        last_of_image = final and (pos + blk == n)
        parts.append(struct.pack("<BHH", 1 if last_of_image else 0,
                                 blk, blk ^ 0xFFFF))
        parts.append(mv[pos:pos + blk])
        pos += blk
        if pos >= n:
            break
    if final:
        parts.append(struct.pack(">I", adler & 0xFFFFFFFF))
    return parts


def write_png_streaming(path: str, img, bands: int = 8,
                        compression: int = 0) -> None:
    """Own grayscale PNG encoder that streams a DEVICE-resident image.

    The product download is a serial tail of the pipeline (docs/PERF.md:
    8.6 MB over a ~23 MB/s relay ≈ 0.37 s, then 0.14 s of encode).  This
    writer slices the image into row bands, starts ALL the device->host
    copies asynchronously (jax.Array.copy_to_host_async), and encodes band
    k while bands k+1.. are still in flight — the encode rides inside the
    transfer instead of after it.  Accepts numpy input too (plain encode).

    Output is a standard 8/16-bit grayscale PNG (zlib level matches the
    reference's cv2 compression-0 products, solex_util.py:556-566); decoded
    pixels are identical to the cv2 writer's (tests/test_io.py).
    """
    import struct
    import zlib

    h, w = img.shape
    nb = max(1, min(int(bands), h))
    bounds = [(h * k // nb, h * (k + 1) // nb) for k in range(nb)]
    slices = [img[a:b] for a, b in bounds]
    for s in slices:
        try:
            s.copy_to_host_async()
        except AttributeError:
            pass  # numpy input: nothing to overlap

    first = np.asarray(slices[0])
    if first.dtype == np.uint8:
        depth, be = 8, "|u1"
    else:
        depth, be = 16, ">u2"

    level = int(compression)
    comp = zlib.compressobj(level=level) if level > 0 else None
    adler = 1
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        _png_chunk(f, b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
        for k, s in enumerate(slices):
            rows = np.asarray(first if k == 0 else s)
            if rows.dtype not in (np.uint8, np.uint16):
                rows = np.clip(rows, 0, 65535).astype(np.uint16)
            # device pulls can come back F-contiguous — the pack forces C
            # order for the byte view
            rows = np.ascontiguousarray(rows)
            if comp is None:
                # fused native band encode: pack + stored framing + adler
                # + chunk crc in ONE cache-hot pass (byte-identical to the
                # python composition below, tests/test_io.py)
                from .native import native_png_encode_band

                enc = native_png_encode_band(
                    rows, first=(k == 0), final=(k == len(slices) - 1),
                    adler=adler, crc=zlib.crc32(b"IDAT"),
                )
                if enc is not None:
                    body, adler, crc = enc
                    f.write(struct.pack(">I", len(body)))
                    f.write(b"IDAT")
                    f.write(body)
                    f.write(struct.pack(">I", crc & 0xFFFFFFFF))
                    continue
            payload = _pack_scanlines(rows, be)
            if comp is not None:  # compressed path (non-product callers)
                data = comp.compress(payload)
                if data:
                    _png_chunk(f, b"IDAT", data)
                continue
            # level 0 (the reference's product setting): own stored-block
            # framing — one pass, no zlib buffer copies, deterministic
            # bytes shared by the python and native pack paths
            adler = zlib.adler32(payload, adler)
            _png_chunk_parts(
                f, b"IDAT",
                _stored_parts(payload, first=(k == 0),
                              final=(k == len(slices) - 1), adler=adler),
            )
        if comp is not None:
            tail = comp.flush()
            if tail:
                _png_chunk(f, b"IDAT", tail)
        _png_chunk(f, b"IEND", b"")


def png_bytes(img: np.ndarray, compression: int = 0) -> bytes:
    """In-memory PNG of a host image (GUI previews — sg.Image data)."""
    import io
    import tempfile

    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        img = np.clip(img, 0, 65535).astype(np.uint16)
    if _HAVE_CV2:
        ok, buf = cv2.imencode(".png", img,
                               [cv2.IMWRITE_PNG_COMPRESSION, compression])
        if ok:
            return buf.tobytes()
    if _HAVE_PIL:
        bio = io.BytesIO()
        mode = "I;16" if img.dtype == np.uint16 else "L"
        Image.fromarray(img, mode=mode).save(bio, format="PNG")
        return bio.getvalue()
    with tempfile.NamedTemporaryFile(suffix=".png") as tf:
        write_png_streaming(tf.name, img, compression=compression)
        with open(tf.name, "rb") as f:
            return f.read()


def read_image(path: str) -> np.ndarray:
    """Read PNG/TIF preserving bit depth, grayscale-converting if needed.

    reference: clahe_apply.py:244-246 (imread ANYDEPTH + BGR2GRAY).
    """
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
        if img is None:
            raise IOError(f"cannot read image {path}")
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img
    if _HAVE_PIL:
        img = np.asarray(Image.open(path))
        if img.ndim == 3:
            # PIL decodes RGB order: R gets the 0.299 weight
            dtype = img.dtype
            img = np.round(
                0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
            ).astype(dtype)
        return img
    raise RuntimeError("no image backend available (need cv2 or PIL)")
