"""AVI container path (cv2-backed demuxer; reference video_reader.py:68-80)."""

import os

import cv2
import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.io.video import open_video
from solex_ser_recon_en_tpu.pipeline.run import process_file


@pytest.fixture(scope="module")
def avi_scan(tmp_path_factory):
    d = tmp_path_factory.mktemp("avi")
    path = str(d / "scan.avi")
    scan = SyntheticScan(
        ih=240, iw=96, frames=120, depth=8,
        line_poly=(48.0, 0.0, 0.0, 0.0), disk_radius=55.0, noise=0.004, seed=6,
    )
    frames16 = scan.write(str(d / "tmp.ser"))  # reuse generator; uint16 x256
    frames8 = (frames16 >> 8).astype(np.uint8)
    # store tall (H > W): no rotation, grayscale MJPG
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
        (frames8.shape[2], frames8.shape[1]), isColor=False,
    )
    assert w.isOpened()
    for f in frames8:
        w.write(f)
    w.release()
    return path, frames8


def test_avi_reader(avi_scan):
    path, frames8 = avi_scan
    v = open_video(path)
    assert v.frame_count == len(frames8)
    assert (v.ih, v.iw) == (240, 96)
    got = v.read_all()
    assert got.shape == (len(frames8), 240, 96)
    assert got.dtype == np.uint16
    # MJPG is lossy: compare de-quantised content loosely
    err = np.abs(got.astype(int) - (frames8.astype(int) << 8)).mean()
    assert err < 1500  # ~2% of full scale


def test_avi_end_to_end(avi_scan, tmp_path):
    path, _ = avi_scan
    opts = Options(shift=[0], clahe_only=True, transversalium=False,
                   output_dir=str(tmp_path))
    results = process_file(path, opts)
    assert len(results) == 1
    assert os.path.exists(os.path.join(str(tmp_path), "scan_shift=0_clahe.png"))


@pytest.fixture(scope="module")
def y800_avi(tmp_path_factory):
    """Uncompressed grayscale (Y800) AVIs, tall and wide storage."""
    d = tmp_path_factory.mktemp("y800")
    rng = np.random.default_rng(3)
    tall = rng.integers(0, 256, (40, 200, 64), dtype=np.uint8)
    wide = np.ascontiguousarray(tall.transpose(0, 2, 1))
    paths = {}
    for name, frames in (("tall", tall), ("wide", wide)):
        p = str(d / f"{name}.avi")
        w = cv2.VideoWriter(
            p, cv2.VideoWriter_fourcc(*"Y800"), 30.0,
            (frames.shape[2], frames.shape[1]), isColor=False,
        )
        assert w.isOpened()
        for f in frames:
            w.write(f)
        w.release()
        paths[name] = p
    return paths


def test_raw_y800_bit_identical_to_cv2(y800_avi):
    """The zero-copy Y800 index must decode EXACTLY like cv2's demuxer
    (including the rotate-to-tall normalisation for wide storage)."""
    from solex_ser_recon_en_tpu.io.video import _AviVideo

    for name, p in y800_avi.items():
        v = _AviVideo(p)
        assert v._raw is not None, f"{name}: raw index not taken"
        got = v.read_all()
        forced = _AviVideo(p)
        forced._raw = None
        forced._open_cv2(p)
        want = forced._read_cv2(0, forced.frame_count)
        assert got.shape == want.shape
        assert np.array_equal(got, want), f"{name}: raw != cv2"
        # chunked reads see the same bytes as one slab read
        mid = v.read(7, 9)
        assert np.array_equal(mid, got[7:16])


def test_mjpg_falls_back_to_cv2(avi_scan):
    """Compressed containers must not take the raw index."""
    from solex_ser_recon_en_tpu.io.video import _AviVideo, _parse_raw_gray_avi

    path, _ = avi_scan
    assert _parse_raw_gray_avi(path) is None
    assert _AviVideo(path)._raw is None


def _write_y800_avi_raw(path, frames, opendml_split=None):
    """Hand-rolled minimal Y800 AVI writer (optionally split into an
    OpenDML 'RIFF AVIX' continuation after ``opendml_split`` frames)."""
    import struct

    n, h, w = frames.shape

    def chunk(fourcc, data):
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b"")

    def lst(ltype, payload):
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack("<14I", 33333, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"Y800" + struct.pack("<I", 0)
            + struct.pack("<10I", 0, 0, 0, 1, 30, 0, n, 0, 0, 0))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 8, 0x30303859,
                       w * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    k = opendml_split if opendml_split is not None else n
    movi1 = lst(b"movi", b"".join(chunk(b"00dc", f.tobytes())
                                  for f in frames[:k]))
    seg1 = b"RIFF" + struct.pack(
        "<I", 4 + len(hdrl) + len(movi1)) + b"AVI " + hdrl + movi1
    out = seg1
    if opendml_split is not None:
        movi2 = lst(b"movi", b"".join(chunk(b"00dc", f.tobytes())
                                      for f in frames[k:]))
        out += b"RIFF" + struct.pack("<I", 4 + len(movi2)) + b"AVIX" + movi2
    with open(path, "wb") as f:
        f.write(out)


def test_opendml_avix_segments_fully_indexed(tmp_path):
    """Frames in 'RIFF AVIX' continuation segments (OpenDML >1 GB layout)
    must all be indexed, not silently truncated to the first segment."""
    from solex_ser_recon_en_tpu.io.video import _parse_raw_gray_avi, _AviVideo

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (12, 32, 24), dtype=np.uint8)
    p = str(tmp_path / "odml.avi")
    _write_y800_avi_raw(p, frames, opendml_split=5)
    parsed = _parse_raw_gray_avi(p)
    assert parsed is not None and len(parsed[2]) == 12
    v = _AviVideo(p)
    got = v.read_all()
    assert got.shape[0] == 12
    assert np.array_equal(got, frames.astype(np.uint16) << 8)


def test_truncated_y800_keeps_complete_frames(tmp_path):
    """An interrupted capture (last plane cut short) must yield exactly the
    complete frames — no out-of-bounds strided reads, no exception."""
    from solex_ser_recon_en_tpu.io.video import _parse_raw_gray_avi, _AviVideo

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (6, 16, 10), dtype=np.uint8)
    p = str(tmp_path / "trunc.avi")
    _write_y800_avi_raw(p, frames)
    size = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(size - 16 * 10 // 2)  # cut the last plane in half
    parsed = _parse_raw_gray_avi(p)
    assert parsed is not None and len(parsed[2]) == 5
    got = _AviVideo(p).read_all()
    assert np.array_equal(got, frames[:5].astype(np.uint16) << 8)


def test_corrupt_avi_header_falls_back_not_raises(tmp_path):
    """strf chunk header near EOF (short read) must return None, not leak
    struct.error out of the parser."""
    from solex_ser_recon_en_tpu.io.video import _parse_raw_gray_avi
    import struct

    p = str(tmp_path / "bad.avi")
    body = b"LIST" + struct.pack("<I", 100) + b"hdrl" + \
        b"strf" + struct.pack("<I", 64) + b"\x00" * 8  # claims 64, has 8
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body)
    assert _parse_raw_gray_avi(p) is None
