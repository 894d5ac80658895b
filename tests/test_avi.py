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
