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
