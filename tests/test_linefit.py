"""Spectral-line detection/fit tests on synthetic scans with known truth."""

import numpy as np

from solex_ser_recon_en_tpu.geometry import detect_bord, fit_spectral_line
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.ops import mean_max


def test_detect_bord_finds_disk_extent():
    scan = SyntheticScan(ih=256, iw=96, frames=200, seed=3)
    frames = scan.generate()
    _, mx = mean_max(frames)
    y1, y2 = detect_bord(mx, axis=1)
    cy = scan.disk_center[1]
    r = scan.disk_radius
    assert abs(y1 - (cy - r)) < 8
    assert abs(y2 - (cy + r)) < 8


def test_fit_recovers_cubic_line(basic_scan):
    scan = basic_scan["scan"]
    frames = basic_scan["frames"]
    mean, mx = mean_max(frames)
    lf = fit_spectral_line(mean, mx)
    y = np.arange(scan.ih)
    true_curve = scan.line_center(y.astype(np.float64))
    # inside the detected extent the fit must track the true line closely
    sl = slice(lf.y1, lf.y2)
    err = np.abs(lf.curve[sl] - true_curve[sl])
    # the detector fits integer argmins (as the reference does), so the
    # curve carries sub-pixel quantisation bias; ~1 px is the attainable level
    assert err.max() < 1.5, f"max line-fit error {err.max():.3f} px"
    assert err.mean() < 0.5, f"mean line-fit error {err.mean():.3f} px"
    # fit_array layout matches the reference (solex_util.py:258-259)
    fa = lf.fit_array
    np.testing.assert_array_equal(fa[:, 0], np.floor(lf.curve))
    np.testing.assert_allclose(fa[:, 1], lf.curve - np.floor(lf.curve))
    np.testing.assert_array_equal(fa[:, 2], y)


def test_fit_straight_line():
    scan = SyntheticScan(
        ih=300, iw=80, frames=150, line_poly=(40.0, 0.0, 0.0, 0.0), seed=5
    )
    frames = scan.generate()
    mean, mx = mean_max(frames)
    lf = fit_spectral_line(mean, mx)
    assert abs(lf.poly[0] - 40.0) < 0.3
    assert np.abs(lf.poly[1:]).max() < 1e-2
