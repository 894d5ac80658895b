"""Golden tests against the REFERENCE'S OWN CODE.

The reference implementation is mounted read-only at /root/reference; its
numeric core (video_reader, compute_mean_max, compute_mean_return_fit,
read_video_improved, correct_transversalium2, rescale_brightness) needs only
numpy/cv2/scipy/matplotlib, which exist here — the missing GUI/FITS deps
(FreeSimpleGUI, astropy) are stubbed.  These tests run the reference
functions on our synthetic scans and assert our pipeline matches them.

Skipped automatically when /root/reference is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference mount")


@pytest.fixture(scope="module")
def ref_modules():
    np.NaN = np.nan  # the reference predates numpy 2.0 (solex_util.py:624)
    for name in ("astropy", "astropy.io", "astropy.io.fits", "FreeSimpleGUI"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["astropy.io"].fits = sys.modules["astropy.io.fits"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import solex_util as ref_solex_util  # noqa: E402
    import video_reader as ref_video_reader  # noqa: E402

    return ref_solex_util, ref_video_reader


@pytest.fixture(scope="module")
def scan_path(tmp_path_factory):
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    p = str(tmp_path_factory.mktemp("refgold") / "scan.ser")
    scan = SyntheticScan(
        ih=256, iw=96, frames=160, depth=16,
        line_poly=(48.0, 0.015, -6e-5, 0.0),
        trans_stripes=0.1, noise=0.002, seed=77,
    )
    scan.write(p, transpose_to_wide=True)
    return p


def _ref_options():
    # minimal option keys the reference functions read
    return {
        "flag_display": False,
        "save_fit": False,
        "clahe_only": True,   # skips the matplotlib plot branch
        "protus_only": False,
        "_nolog": True,
        "shift": [0],
        "trans_strength": 151,
        "stubborn_transversalium": False,
        "output_dir": "",
    }


def test_reference_video_reader_agrees(ref_modules, scan_path):
    _, ref_vr = ref_modules
    from solex_ser_recon_en_tpu.io.ser import SerReader

    rdr = ref_vr.video_reader(scan_path)
    ours = SerReader(scan_path)
    assert (rdr.ih, rdr.iw) == (ours.ih, ours.iw)
    assert rdr.FrameCount == ours.frame_count
    got = []
    while rdr.has_frames() and len(got) < 30:
        got.append(rdr.next_frame())
    np.testing.assert_array_equal(np.stack(got), ours.read(0, 30))


def test_reference_mean_max_agrees(ref_modules, scan_path):
    ref_su, ref_vr = ref_modules
    from solex_ser_recon_en_tpu.io.video import open_video
    from solex_ser_recon_en_tpu.io.feeder import raw_device_chunks
    from solex_ser_recon_en_tpu.ops.fused import RawScanProcessor

    mean_ref, max_ref = ref_su.compute_mean_max(
        ref_vr.video_reader(scan_path), _ref_options(), "x"
    )
    vid = open_video(scan_path)
    it, rot, ups = raw_device_chunks(vid, 64)
    proc = RawScanProcessor(vid.Height, vid.Width, rot, ups,
                            frame_count=vid.frame_count)
    for s, c in it:
        proc.accumulate(s, c)
    mean_ours, max_ours = proc.mean_max()
    np.testing.assert_array_equal(mean_ours, mean_ref)
    np.testing.assert_array_equal(max_ours, max_ref)


def test_reference_line_fit_agrees(ref_modules, scan_path):
    ref_su, ref_vr = ref_modules
    from solex_ser_recon_en_tpu.geometry import fit_spectral_line
    from solex_ser_recon_en_tpu.ops.reduce import mean_max
    from solex_ser_recon_en_tpu.io.video import open_video

    rdr = ref_vr.video_reader(scan_path)
    mean_img, fit_ref, y1_ref, y2_ref = ref_su.compute_mean_return_fit(
        ref_vr.video_reader(scan_path), _ref_options(), {}, rdr.iw, rdr.ih, "x"
    )
    frames = open_video(scan_path).read_all()
    m, mx = mean_max(frames)
    lf = fit_spectral_line(m, mx)
    assert (lf.y1, lf.y2) == (y1_ref, y2_ref)
    # same curve within sub-pixel everywhere inside the detected band
    # (outside it the cubics may diverge; the recon only uses clipped
    # indices there); mode tie-breaks can shift the constant slightly
    err = np.abs(lf.curve[y1_ref:y2_ref] - fit_ref[y1_ref:y2_ref, 3])
    assert err.max() < 0.35, err.max()


def test_reference_recon_agrees(ref_modules, scan_path):
    ref_su, ref_vr = ref_modules
    from solex_ser_recon_en_tpu.ops.recon import reconstruct
    from solex_ser_recon_en_tpu.io.video import open_video

    rdr = ref_vr.video_reader(scan_path)
    opts = _ref_options()
    mean_img, fit_ref, _, _ = ref_su.compute_mean_return_fit(
        ref_vr.video_reader(scan_path), opts, {}, rdr.iw, rdr.ih, "x"
    )
    opts["shift"] = [10, 0, -4]
    disks_ref, ih, iw, fc = ref_su.read_video_improved(
        ref_vr.video_reader(scan_path), fit_ref, opts
    )
    frames = open_video(scan_path).read_all()
    floor = fit_ref[:, 0].astype(np.int64)
    frac = fit_ref[:, 1]
    ours = np.asarray(reconstruct(frames, floor, frac, [10, 0, -4]))
    for i in range(3):
        diff = np.abs(ours[i].astype(int) - disks_ref[i].astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02


def test_reference_host_recon_bit_exact(ref_modules, scan_path):
    """The host float64 recon (feed_mode='host') matches the reference's
    read_video_improved BIT-FOR-BIT — same arithmetic, same truncation."""
    ref_su, ref_vr = ref_modules
    from solex_ser_recon_en_tpu.io.hostreduce import host_reconstruct
    from solex_ser_recon_en_tpu.io.ser import SerReader

    rdr = ref_vr.video_reader(scan_path)
    opts = _ref_options()
    mean_img, fit_ref, _, _ = ref_su.compute_mean_return_fit(
        ref_vr.video_reader(scan_path), opts, {}, rdr.iw, rdr.ih, "x"
    )
    opts["shift"] = [10, 0, -4]
    disks_ref, ih, iw, fc = ref_su.read_video_improved(
        ref_vr.video_reader(scan_path), fit_ref, opts
    )
    r = SerReader(scan_path)
    floor = fit_ref[:, 0].astype(np.int64)
    frac = fit_ref[:, 1]
    ours = host_reconstruct(r, floor, frac, [10, 0, -4], chunk_frames=48)
    for i in range(3):
        np.testing.assert_array_equal(ours[i], disks_ref[i])


def test_reference_transversalium_agrees(ref_modules):
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.pipeline.transversalium import correct_transversalium

    # striped disk (same construction as tests/test_photometric.py)
    rng = np.random.default_rng(5)
    h, w = 280, 260
    cy, cx, r = h / 2, w / 2, 100.0
    ys, xs = np.mgrid[:h, :w]
    rho2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / r**2
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    disk = np.where(rho2 < 1, 1 - 0.4 * (1 - mu), 0.01) * 42000
    gain = 1 + 0.1 * np.sin(np.arange(h) / 2.3)
    img = np.clip(disk * gain[:, None] + rng.normal(0, 25, disk.shape), 1, 65535
                  ).astype(np.uint16)
    circle = (cx, cy, r)
    borders = [0, cy - r + 10, w - 1, cy + r - 10]
    opts = _ref_options()
    ref_out = ref_su.correct_transversalium2(img, circle, borders, opts, 0, "x")
    ours, _ = correct_transversalium(img, circle, borders, trans_strength=151)
    diff = np.abs(np.asarray(ours).astype(int) - ref_out.astype(int))
    # identical algorithm, device f32 row stats vs host f64: tiny residue
    assert np.median(diff) == 0
    assert diff.max() <= max(2, int(0.002 * 65535))


def test_reference_rescale_brightness_agrees(ref_modules, rng):
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.ops.stretch import rescale_brightness

    img = rng.integers(0, 65536, size=(40, 50), dtype=np.uint16)
    # lo/hi as floats, like every real call site (solex_util.py:539-541);
    # integer lo would wrap `img - lo` under numpy 2 value-based casting
    ref_out = ref_su.rescale_brightness(img, 500.0, 60000.0, alpha=0.9)
    ours = np.asarray(rescale_brightness(img, 500.0, 60000.0, alpha=0.9))
    assert np.abs(ours.astype(int) - ref_out.astype(int)).max() <= 1


@pytest.fixture(scope="module")
def ref_geometry(ref_modules):
    """Import the reference's ellipse_to_circle with skimage/lsq-ellipse
    stubs (only the matrix math paths are exercised)."""
    from solex_ser_recon_en_tpu.geometry.ellipse import ellipse_points, fit_ellipse

    class _LsqEllipse:
        def fit(self, X):
            self._p = fit_ellipse(X)
            return self

        def as_parameters(self):
            c, w, h, phi = self._p
            return tuple(c), w, h, phi

        def return_fit(self, n_points=100):
            c, w, h, phi = self._p
            return ellipse_points(c, w, h, phi, n_points)

    for name in ("skimage", "skimage.feature", "skimage.data",
                 "skimage.data._fetchers", "skimage.transform",
                 "skimage.filters", "ellipse"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].feature = sys.modules["skimage.feature"]
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]
    sys.modules["skimage"].filters = sys.modules["skimage.filters"]
    sys.modules["skimage"].data = sys.modules["skimage.data"]
    sys.modules["skimage.transform"].downscale_local_mean = lambda *a, **k: None
    sys.modules["ellipse"].LsqEllipse = _LsqEllipse
    import ellipse_to_circle as ref_e2c

    return ref_e2c


def test_reference_correction_matrix_agrees(ref_geometry):
    from solex_ser_recon_en_tpu.geometry.ellipse import get_correction_matrix

    for phi, r in [(0.3, 0.8), (-0.2, 1.3), (0.0, 1.0), (0.7, 0.6)]:
        m_ref, t_ref = ref_geometry.get_correction_matrix(phi, r)
        m_ours, t_ours = get_correction_matrix(phi, r)
        np.testing.assert_allclose(m_ours, m_ref, atol=1e-12)
        assert t_ours == pytest.approx(t_ref, abs=1e-12)


def test_reference_two_step_agrees(ref_geometry):
    from solex_ser_recon_en_tpu.geometry.ellipse import two_step

    rng = np.random.default_rng(3)
    t = np.linspace(0, 2 * np.pi, 180, endpoint=False)
    a, b, phi0 = 120.0, 90.0, 1.0  # strongly rotated: exercises the folding
    R = np.array([[np.cos(phi0), -np.sin(phi0)], [np.sin(phi0), np.cos(phi0)]])
    pts = (R @ np.stack([a * np.cos(t), b * np.sin(t)])).T + np.array([40.0, 60.0])
    pts += rng.normal(0, 0.3, pts.shape)

    c_ref, h_ref, phi_ref, ratio_ref, kept_ref, _ = ref_geometry.two_step(pts)
    c_ours, h_ours, phi_ours, ratio_ours, kept_ours, _ = two_step(pts)
    np.testing.assert_allclose(c_ours, c_ref, atol=1e-9)
    assert h_ours == pytest.approx(h_ref, rel=1e-9)
    assert phi_ours == pytest.approx(phi_ref, abs=1e-9)
    assert ratio_ours == pytest.approx(ratio_ref, rel=1e-9)
    assert kept_ours.shape == kept_ref.shape


@pytest.mark.parametrize("host_products", ["0", "1"])
def test_reference_image_process_agrees(ref_modules, tmp_path, monkeypatch,
                                        host_products):
    """Full product stage vs the reference's image_process (CLAHE, stretches,
    protus disc, rotation) — files suppressed via _nolog/save_fit.
    Parametrised over BOTH product cores (the XLA programs and the
    cv2/numpy host twin the CPU-only bench path takes)."""
    monkeypatch.setenv("SOLEX_HOST_PRODUCTS", host_products)
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.pipeline.products import image_process

    rng = np.random.default_rng(11)
    h, w = 220, 240
    cy, cx, r = h / 2, w / 2, 80.0
    ys, xs = np.mgrid[:h, :w]
    rho2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / r**2
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    frame = (
        np.where(rho2 < 1, 1 - 0.4 * (1 - mu), 0.01) * 43000
        + rng.normal(0, 40, (h, w))
    ).clip(0, 65535).astype(np.uint16)
    circle = (cx, cy, r)

    opts_ref = _ref_options()
    opts_ref.update({"disk_display": True, "delta_radius": 2, "img_rotate": 90,
                     "tempo": 1})
    cc_ref, protus_ref = ref_su.image_process(frame, circle, opts_ref, {}, "x")

    opts = Options(_nolog=True, disk_display=True, delta_radius=2, img_rotate=90)
    cc, protus = image_process(frame, circle, opts, save=False)
    d_cc = np.abs(cc.astype(int) - cc_ref.astype(int))
    d_pr = np.abs(protus.astype(int) - protus_ref.astype(int))
    assert d_cc.max() <= 4, d_cc.max()
    assert d_pr.max() <= 4, d_pr.max()


@pytest.mark.parametrize("host_products", ["0", "1"])
def test_reference_single_image_process_agrees(ref_modules, ref_geometry,
                                               tmp_path, monkeypatch,
                                               host_products):
    """The whole post-circularisation path (transversalium + crop + products)
    against the reference's single_image_process (Solex_recon.py:136-174).
    Parametrised over BOTH product cores (XLA programs / host twin)."""
    monkeypatch.setenv("SOLEX_HOST_PRODUCTS", host_products)
    ref_su, _ = ref_modules
    sys.modules.setdefault("FreeSimpleGUI", types.ModuleType("FreeSimpleGUI"))
    import Solex_recon as ref_recon  # noqa: E402

    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.pipeline.run import single_image_process

    rng = np.random.default_rng(13)
    h, w = 240, 260
    cy, cx, r = h / 2, w / 2, 90.0
    ys, xs = np.mgrid[:h, :w]
    rho2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / r**2
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    gain = 1 + 0.08 * np.sin(np.arange(h) / 2.7)
    frame = (
        (np.where(rho2 < 1, 1 - 0.4 * (1 - mu), 0.01) * 41000) * gain[:, None]
        + rng.normal(0, 30, (h, w))
    ).clip(1, 65535).astype(np.uint16)
    circle = (cx, cy, r)
    borders = [0, cy - r + 8, w - 1, cy + r - 8]
    backup = (20, h - 20)

    opts_ref = _ref_options()
    opts_ref.update({"disk_display": True, "delta_radius": 0, "img_rotate": 0,
                     "tempo": 1, "transversalium": True, "fixed_width": 230,
                     "crop_width_square": False, "flip_x": False,
                     "de-vignette": False})
    cc_ref, pr_ref = ref_recon.single_image_process(
        frame.copy(), {}, opts_ref, circle, borders, "x", backup
    )

    opts = Options(_nolog=True, disk_display=True, transversalium=True,
                   trans_strength=151, fixed_width=230)
    cc, pr = single_image_process(frame, {}, opts, circle, borders, "x",
                                  backup, save=False)
    d_cc = np.abs(np.asarray(cc).astype(int) - cc_ref.astype(int))
    d_pr = np.abs(np.asarray(pr).astype(int) - pr_ref.astype(int))
    # device f32 row stats shift the transversalium gain by ~1e-7, which the
    # CLAHE CDF rescale amplifies: median 1 level, tails ~0.1% of full scale
    assert np.median(d_cc) <= 1 and d_cc.max() <= 150, (np.median(d_cc), d_cc.max())
    assert np.median(d_pr) <= 1 and d_pr.max() <= 150, (np.median(d_pr), d_pr.max())


def _disk_image(rng, h=300, w=280, r=105.0, stripe=0.0, vignette=0.0):
    cy, cx = h / 2, w / 2
    ys, xs = np.mgrid[:h, :w]
    rho2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / r**2
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    img = np.where(rho2 < 1, 1 - 0.4 * (1 - mu), 0.01) * 42000
    y = np.arange(h)
    if stripe:
        img = img * (1 + stripe * np.sin(y / 2.3))[:, None]
    if vignette:
        img = img * (1 - vignette * ((y - h / 2) / (h / 2)) ** 2)[:, None]
    img = img + rng.normal(0, 25, img.shape)
    return np.clip(img, 1, 65535).astype(np.uint16), (cx, cy, r)


def test_reference_detect_bord_agrees(ref_modules, rng):
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.geometry import detect_bord

    img, _ = _disk_image(rng)
    assert detect_bord(img, axis=1) == ref_su.detect_bord(img, axis=1)
    assert detect_bord(img, axis=0) == ref_su.detect_bord(img, axis=0)


def test_reference_remove_vignette_agrees(ref_modules, rng):
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.pipeline.vignette import remove_vignette

    img, circle = _disk_image(rng, h=380, w=360, r=140.0, vignette=0.25)
    ref_out = ref_su.removeVignette(img.astype(np.float64), circle)
    ours = np.asarray(remove_vignette(img, circle), dtype=np.float64)
    # identical trend math (scipy savgol/gaussian on host); device axis
    # percentiles are f32 -> tiny relative residue
    rel = np.abs(ours - ref_out) / np.maximum(np.abs(ref_out), 1.0)
    assert np.median(rel) < 1e-4
    assert rel.max() < 5e-3, rel.max()


def test_reference_stubborn_filter_agrees(ref_modules, rng):
    ref_su, _ = ref_modules
    from solex_ser_recon_en_tpu.pipeline.transversalium import correct_transversalium

    img, circle = _disk_image(rng, stripe=0.3)
    h, w = img.shape
    borders = [0, circle[1] - circle[2] + 10, w - 1, circle[1] + circle[2] - 10]
    opts = _ref_options()
    opts["stubborn_transversalium"] = True
    ref_out = ref_su.correct_transversalium2(img, circle, borders, opts, 0, "x")
    ours, _ = correct_transversalium(img, circle, borders, trans_strength=151,
                                     stubborn=True)
    diff = np.abs(np.asarray(ours).astype(int) - ref_out.astype(int))
    assert np.median(diff) <= 1
    assert diff.max() <= 200, diff.max()  # f32 filters vs f64, log-exp chain


def test_reference_flood_threshold_agrees(ref_modules, ref_geometry, rng):
    from solex_ser_recon_en_tpu.geometry.edges import get_flood_image

    img, _ = _disk_image(rng, h=320, w=300, r=110.0)
    small = img.astype(np.float64) / 65536.0
    ref_flood = ref_geometry.get_flood_image(small)
    ours = get_flood_image(small)
    # same binarisation threshold -> same blob, up to blur f32 rounding
    agree = (ref_flood > 0) == (ours > 0)
    assert agree.mean() > 0.999


def test_reference_clahe_apply_tool_agrees(ref_modules, tmp_path, rng):
    """The standalone CLAHE tool vs the reference's own clahe_apply
    (clahe_apply.py:243-256), across tile sizes and the stretch path."""
    import importlib

    ref_clahe_apply = importlib.import_module("clahe_apply")
    from solex_ser_recon_en_tpu.cli.clahe_tool import apply_clahe
    from solex_ser_recon_en_tpu.io.png import write_png

    img = (rng.random((96, 128)) * 60000).astype(np.uint16)
    p = str(tmp_path / "in.png")
    write_png(p, img)

    for tile, stretch in ((2, False), (1, True), (4, True)):
        opts = {"tile_size": tile, "lo": 5, "hi": 95, "sat": 80,
                "do_stretch": stretch}
        want = ref_clahe_apply.apply_clahe(p, dict(opts), write_file=False)
        got = np.asarray(apply_clahe(p, dict(opts), write_file=False))
        # the stretch runs in f32 on device vs the reference's f64 numpy:
        # same 1-LSB tolerance the recon golden tests use
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02
