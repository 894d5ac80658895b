"""I/O layer tests: SER demux/mux, FITS round trip, PNG round trip."""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.io import (
    SerReader,
    write_ser,
    open_video,
    write_fits,
    read_fits,
    make_header,
    write_png,
    read_image,
)


def test_ser_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 65536, size=(7, 40, 24), dtype=np.uint16)
    p = str(tmp_path / "a.ser")
    write_ser(p, frames)
    r = SerReader(p)
    assert r.frame_count == 7
    assert (r.Height, r.Width) == (40, 24)
    assert not r.flag_rotate and (r.ih, r.iw) == (40, 24)
    np.testing.assert_array_equal(r.read(), frames)
    # chunked access agrees
    chunks = [c for _, c in r.chunks(3)]
    np.testing.assert_array_equal(np.concatenate(chunks), frames)


def test_ser_rotate_and_8bit_upscale(tmp_path):
    """Width > Height frames are rot90'd; 8-bit is upscaled x256.

    reference: video_reader.py:84-91,119-122
    """
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(5, 16, 48), dtype=np.uint8)  # wide
    p = str(tmp_path / "b.ser")
    write_ser(p, frames)
    r = SerReader(p)
    assert r.flag_rotate and (r.ih, r.iw) == (48, 16)
    expected = np.rot90(frames, axes=(1, 2)).astype(np.uint16) * 256
    np.testing.assert_array_equal(r.read(), expected)


def test_ser_truncated_file_clamps_framecount(tmp_path):
    frames = np.zeros((10, 8, 8), dtype=np.uint16)
    p = str(tmp_path / "c.ser")
    write_ser(p, frames)
    # chop off the last 1.5 frames
    size = 178 + 10 * 8 * 8 * 2
    with open(p, "r+b") as f:
        f.truncate(size - 8 * 8 * 3)
    r = SerReader(p)
    assert r.frame_count == 8
    assert r.read().shape[0] == 8


def test_open_video_dispatch(tmp_path):
    frames = np.zeros((3, 8, 6), dtype=np.uint16)
    p = str(tmp_path / "d.ser")
    write_ser(p, frames)
    v = open_video(p)
    assert v.read_all().shape == (3, 8, 6)
    with pytest.raises(ValueError):
        open_video(str(tmp_path / "e.mp4"))


@pytest.mark.parametrize(
    "dtype,hi",
    [(np.uint16, 65535), (np.int32, 2**31 - 1), (np.float32, 1.0)],
)
def test_fits_roundtrip(tmp_path, dtype, hi):
    rng = np.random.default_rng(2)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, hi, size=(13, 17)).astype(dtype)
    else:
        data = rng.random((13, 17)).astype(dtype)
    p = str(tmp_path / "x.fits")
    write_fits(p, data, make_header(17, 13))
    back, hdr = read_fits(p)
    np.testing.assert_array_equal(back, data)
    assert hdr["NAXIS1"] == 17 and hdr["NAXIS2"] == 13
    assert hdr["EXPTIME"] == 0


def test_fits_matches_reference_conventions(tmp_path):
    """uint16 is written as BITPIX=16 + BZERO=32768 (astropy convention)."""
    data = np.array([[0, 1], [65535, 32768]], dtype=np.uint16)
    p = str(tmp_path / "y.fits")
    write_fits(p, data)
    back, hdr = read_fits(p)
    assert hdr["BITPIX"] == 16 and hdr["BZERO"] == 32768
    np.testing.assert_array_equal(back, data)
    # file size is a multiple of 2880
    import os

    assert os.path.getsize(p) % 2880 == 0


def test_png_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, size=(21, 34), dtype=np.uint16)
    p = str(tmp_path / "z.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_image(p), img)


def test_pagecache_pin_budget_and_reuse(tmp_path, monkeypatch):
    from solex_ser_recon_en_tpu.io import pagecache

    monkeypatch.setattr(pagecache, "_MIN_FILE", 1024)
    monkeypatch.setattr(pagecache, "_BUDGET", 64 * 1024)
    pagecache.clear()
    a = tmp_path / "a.bin"
    b = tmp_path / "b.bin"
    a.write_bytes(b"x" * 40960)
    b.write_bytes(b"y" * 40960)
    assert pagecache.pin(str(a))
    assert pagecache.pin(str(a))  # idempotent
    assert pagecache.pinned_bytes() == 40960
    assert pagecache.pin(str(b))  # evicts a (over budget)
    assert pagecache.pinned_bytes() == 40960
    too_big = tmp_path / "big.bin"
    too_big.write_bytes(b"z" * (128 * 1024))
    assert not pagecache.pin(str(too_big))  # exceeds whole budget
    assert not pagecache.pin(str(tmp_path / "missing.bin"))
    pagecache.clear()
    assert pagecache.pinned_bytes() == 0


def test_pagecache_respects_disable_env(tmp_path, monkeypatch):
    from solex_ser_recon_en_tpu.io import pagecache

    monkeypatch.setattr(pagecache, "_MIN_FILE", 1)
    monkeypatch.setenv("SOLEX_NO_PIN", "1")
    f = tmp_path / "f.bin"
    f.write_bytes(b"x" * 4096)
    assert not pagecache.pin(str(f))


def test_streaming_png_matches_cv2(tmp_path):
    """The banded streaming PNG writer decodes bit-identically to the cv2
    writer, for u16/u8 and device/host inputs, including a non-divisible
    band split."""
    import jax.numpy as jnp
    import numpy as np

    from solex_ser_recon_en_tpu.io.png import (
        read_image,
        write_png,
        write_png_streaming,
    )

    rng = np.random.default_rng(7)
    for dtype, name in ((np.uint16, "u16"), (np.uint8, "u8")):
        img = rng.integers(0, np.iinfo(dtype).max, (131, 77)).astype(dtype)
        ref = str(tmp_path / f"ref_{name}.png")
        write_png(ref, img)
        for src, tag in ((img, "np"), (jnp.asarray(img), "jax")):
            p = str(tmp_path / f"s_{name}_{tag}.png")
            write_png_streaming(p, src, bands=8)
            np.testing.assert_array_equal(read_image(p), read_image(ref))

    # degenerate: more bands than rows
    tiny = rng.integers(0, 65535, (3, 5)).astype(np.uint16)
    p = str(tmp_path / "tiny.png")
    write_png_streaming(p, tiny, bands=8)
    np.testing.assert_array_equal(read_image(p), tiny)


def test_native_png_band_encode_byte_identity(tmp_path, rng):
    """The fused native IDAT band encoder (pack + stored framing + adler32
    + chunk crc32 in one pass) produces byte-identical FILES to the python
    composition, across band-boundary and block-split edge shapes."""
    import solex_ser_recon_en_tpu.io.native as N
    from solex_ser_recon_en_tpu.io.png import write_png_streaming

    if N.native_png_encode_band(
        np.zeros((2, 2), np.uint16), True, True, 1, 0
    ) is None:
        pytest.skip("native library unavailable")

    shapes = [
        ((257, 129), np.uint16),   # odd dims: block splits mid-sample
        ((64, 32767), np.uint16),  # row bytes just under a block
        ((300, 400), np.uint8),
        ((1, 5), np.uint16),       # single row, single band
        ((9, 8), np.uint8),        # bands > rows
    ]
    for shape, dt in shapes:
        hi = 65536 if dt == np.uint16 else 256
        img = rng.integers(0, hi, shape, dtype=np.int64).astype(dt)
        pa = str(tmp_path / "a.png")
        pb = str(tmp_path / "b.png")
        write_png_streaming(pa, img, bands=8)
        orig = N.native_png_encode_band
        N.native_png_encode_band = lambda *a, **k: None
        try:
            write_png_streaming(pb, img, bands=8)
        finally:
            N.native_png_encode_band = orig
        with open(pa, "rb") as f:
            a = f.read()
        with open(pb, "rb") as f:
            b = f.read()
        assert a == b, f"native vs python PNG bytes differ for {shape} {dt}"
