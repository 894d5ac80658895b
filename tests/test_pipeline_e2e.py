"""End-to-end pipeline tests on synthetic scans (CPU, small shapes)."""

import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io import read_fits, read_image
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.pipeline.run import process_file, read_scan, process_scan
from solex_ser_recon_en_tpu.cli.flags import parse_cli, parse_shift_spec
from solex_ser_recon_en_tpu.cli.main import handle_files, handle_folder


@pytest.fixture(scope="module")
def scan_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    path = str(d / "scan.ser")
    scan = SyntheticScan(
        ih=256, iw=80, frames=220, depth=16,
        line_poly=(40.0, 0.01, -4e-5, 0.0),
        squash_y=1.1, disk_radius=80.0, trans_stripes=0.1,
        noise=0.002, seed=33,
    )
    scan.write(path, transpose_to_wide=True)
    return path, scan


def test_full_pipeline_products(scan_file, tmp_path):
    path, scan = scan_file
    opts = Options(shift=[0], save_fit=True, output_dir=str(tmp_path))
    results = process_file(path, opts)
    assert len(results) == 1
    # diagnostic figures ride the deferred lane (io/writers.py); the CLI
    # joins it after the batch — tests join it before asserting existence
    from solex_ser_recon_en_tpu.io.writers import figure_barrier

    figure_barrier()
    base = os.path.join(str(tmp_path), "scan")
    for suffix in (
        "_mean.fits",
        "_shift=0_raw.fits",
        "_shift=0_circular.fits",
        "_shift=0_detransversaliumed.fits",
        "_shift=0_clahe.fits",
        "_shift=0_clahe.png",
        "_shift=0_protus.png",
        "_shift=0_uncontrasted.png",
        "_shift=0_high_contrast.png",
        "_shift=10_ellipse_fit.png",
        "_spectral_line_data.png",
        "_shift=0_transversalium_correction.png",
        "_log.txt",
    ):
        assert os.path.exists(base + suffix), suffix
    # the corrected disk is round
    circ, hdr = read_fits(base + "_shift=0_circular.fits")
    m = circ > 0.4 * circ.max()
    ys, xs = np.nonzero(m)
    ratio = (ys.max() - ys.min()) / (xs.max() - xs.min())
    assert abs(ratio - 1.0) < 0.05
    # log has the key diagnostics
    log = open(base + "_log.txt").read()
    for needle in ("Pixel shift", "polynomial fit", "Y/X ratio", "Disk position"):
        assert needle in log
    # fitted ratio close to the injected squash
    assert opts.ratio_fixe == pytest.approx(1.1, abs=0.05)


def test_multi_shift_sweep(scan_file, tmp_path):
    path, scan = scan_file
    opts = Options(shift=parse_shift_spec("-3:3:3"), clahe_only=True,
                   output_dir=str(tmp_path))
    results = process_file(path, opts)
    # iteration order is the augmented dedup list [10, 0, -3, 3]
    # (Solex_recon.py:55); 0 is requested and already in the prefix
    assert [s for s, _ in results] == [0, -3, 3]
    for s in (-3, 0, 3):
        assert os.path.exists(os.path.join(str(tmp_path), f"scan_shift={s}_clahe.png"))
        # clahe_only: no protus
        assert not os.path.exists(os.path.join(str(tmp_path), f"scan_shift={s}_protus.png"))


def test_no_ellipse_fit_path(scan_file, tmp_path):
    """-x: ratio_fixe=1 disables the ellipse fit (CLI_handler.py:81)."""
    path, scan = scan_file
    opts = Options(shift=[0], ratio_fixe=1, clahe_only=True, output_dir=str(tmp_path))
    results = process_file(path, opts)
    assert len(results) == 1
    # transversalium ran through the backup-bounds path
    assert os.path.exists(os.path.join(str(tmp_path), "scan_shift=0_clahe.png"))


def test_flip_and_rotate_and_crop(scan_file, tmp_path):
    path, scan = scan_file
    opts = Options(
        shift=[0], flip_x=True, img_rotate=90, fixed_width=200,
        transversalium=False, disk_display=False, output_dir=str(tmp_path),
    )
    process_file(path, opts)
    cc = read_image(os.path.join(str(tmp_path), "scan_shift=0_clahe.png"))
    # rotated: (width, height) swap; width was cropped to 200
    assert cc.shape == (200, 256)


def test_cli_flag_parsing_matches_reference():
    # a '-w' with the spec in a separate token exits with a clear error
    # (the reference requires the packed form, CLI_handler.py:50-61)
    with pytest.raises(SystemExit):
        parse_cli(Options(), ["-tw", "0,5"])
    opts = Options()
    files = parse_cli(opts, ["-tw0,5", "-fm", "-r120", "a.ser", "b.AVI", "c.txt"])
    assert opts.shift == [0, 5]
    assert opts.transversalium is False
    assert opts.save_fit is True and opts.flip_x is True
    assert opts.fixed_width == 120
    assert files == ["a.ser", "b.AVI"]
    opts = Options()
    parse_cli(opts, ["-w-5:5:5"])
    assert opts.shift == [-5, 0, 5]
    opts = Options()
    parse_cli(opts, ["-x"])
    assert opts.ratio_fixe == 1


def test_handle_files_isolates_bad_file(scan_file, tmp_path):
    path, scan = scan_file
    bad = str(tmp_path / "bad.ser")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    opts = Options(shift=[0], clahe_only=True, output_dir=str(tmp_path))
    done = handle_files([bad, path], opts)
    assert done == 1  # bad file skipped, good file processed


def test_handle_folder_batch(scan_file, tmp_path):
    path, scan = scan_file
    import shutil

    indir = tmp_path / "in"
    indir.mkdir()
    shutil.copy(path, indir / "one.ser")
    shutil.copy(path, indir / "two.ser")
    opts = Options(shift=[0], clahe_only=True, input_dir=str(indir),
                   output_dir=str(tmp_path))
    n = handle_folder(opts)
    assert n == 2
    assert os.path.exists(os.path.join(str(tmp_path), "one_shift=0_clahe.png"))
    assert os.path.exists(os.path.join(str(tmp_path), "two_shift=0_clahe.png"))


def test_devignette_path(scan_file, tmp_path):
    """de-vignette flag: float data flows through to the products
    (reference keeps removeVignette's float64 result, Solex_recon.py:128)."""
    path, scan = scan_file
    opts = Options(shift=[0], de_vignette=True, clahe_only=True,
                   output_dir=str(tmp_path))
    results = process_file(path, opts)
    assert len(results) == 1
    cc, protus = results[0][1]
    assert cc.dtype == np.uint16
    assert os.path.exists(os.path.join(str(tmp_path), "scan_shift=0_clahe.png"))


def test_stubborn_transversalium_e2e(scan_file, tmp_path):
    path, scan = scan_file
    opts = Options(shift=[0], stubborn_transversalium=True, clahe_only=True,
                   output_dir=str(tmp_path))
    assert len(process_file(path, opts)) == 1


def test_sweep_batched_warp_matches_single(scan_file, tmp_path):
    """The vmapped sweep warp produces the same images as per-shift warps."""
    path, scan = scan_file
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir(), out_b.mkdir()
    # known ratio/slant => every requested shift goes through the warp branch
    shifts = [-3, 0, 3]
    res_a = process_file(path, Options(shift=list(shifts), ratio_fixe=1.05,
                                       slant_fix=1.0, clahe_only=True,
                                       output_dir=str(out_a)))
    for s in shifts:
        a = read_image(os.path.join(str(out_a), f"scan_shift={s}_clahe.png"))
        # single-shift run of the same config must match bit-for-bit
        out_s = tmp_path / f"s{s}"
        out_s.mkdir()
        process_file(path, Options(shift=[s], ratio_fixe=1.05, slant_fix=1.0,
                                   clahe_only=True, output_dir=str(out_s)))
        b = read_image(os.path.join(str(out_s), f"scan_shift={s}_clahe.png"))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed,squash,shear", [
    (21, 1.15, 0.0),
    (22, 0.92, 0.04),
    (23, 1.05, -0.06),
    (24, 1.0, 0.08),
])
def test_geometry_recovery_fuzz(tmp_path, seed, squash, shear):
    """The full fit chain recovers randomized injected squash/shear: the
    fitted Y/X ratio tracks the injected squash within 5% across shapes
    (reference contract: ellipse_to_circle.py:294-342)."""
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.pipeline.run import process_file

    p = str(tmp_path / f"g{seed}.ser")
    SyntheticScan(
        ih=256, iw=96, frames=220, depth=16,
        line_poly=(48.0, 0.01, -1e-5, 0.0),
        squash_y=squash, shear=shear, disk_radius=88.0,
        noise=0.002, seed=seed,
    ).write(p, transpose_to_wide=True)
    opts = Options(shift=[0], clahe_only=True, _nolog=True,
                   output_dir=str(tmp_path))
    results = process_file(p, opts)
    assert len(results) == 1
    # the fit ran (ratio/slant adopted) and the Y/X ratio tracks the
    # injected squash.  A sheared circle is itself an ellipse, so shear
    # couples into the fitted axis ratio (e.g. pure shear 0.08 -> ~0.925);
    # the ratio-recovery tolerance widens with |shear|
    assert opts.slant_fix is not None
    assert opts.ratio_fixe == pytest.approx(squash, rel=0.05 + abs(shear))


def test_fused_gain_path_bit_identical(scan_file, tmp_path):
    """The transversalium row-gain fused into the product program
    (save_fit=False fast path) must produce the exact same CLAHE product
    as the unfused apply-then-products path (save_fit=True forces it)."""
    path, scan = scan_file
    out_a = tmp_path / "fused"
    out_b = tmp_path / "unfused"
    out_a.mkdir()
    out_b.mkdir()
    res_a = process_file(path, Options(shift=[0], clahe_only=True,
                                       output_dir=str(out_a)))
    res_b = process_file(path, Options(shift=[0], clahe_only=True,
                                       save_fit=True, output_dir=str(out_b)))
    assert len(res_a) == len(res_b) == 1
    a = read_image(str(out_a / "scan_shift=0_clahe.png"))
    b = read_image(str(out_b / "scan_shift=0_clahe.png"))
    np.testing.assert_array_equal(a, b)


def test_live_view_progress_hook(scan_file, tmp_path, monkeypatch):
    """-d (Show graphics) drives the per-chunk live-view hook during the
    reconstruction with growing frame coverage (reference live display,
    solex_util.py:136-143; per-chunk granularity here)."""
    import solex_ser_recon_en_tpu.utils.display as display
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    path, scan = scan_file
    seen = []
    monkeypatch.setattr(display, "show", lambda name, img, wait_ms=1:
                        seen.append((name, np.asarray(img).shape)))
    # small chunks force multiple progress callbacks
    opts = Options(shift=[0], clahe_only=True, flag_display=True,
                   frame_chunk=64, output_dir=str(tmp_path), _nolog=True)
    res = read_scan(path, opts)
    assert len(seen) >= 1
    assert all(name in ("disk", "image") for name, _ in seen)
    assert all(len(shape) == 2 for _, shape in seen)
    # the reference also flashes the current slit frame ("image" window,
    # solex_util.py:136-143); one per chunk here
    frames = [shape for name, shape in seen if name == "image"]
    assert len(frames) >= 1
    # slit frame orientation matches the normalizer output (ih rows)
    assert all(shape[0] == scan.ih for shape in frames)
    # the live view accumulates chunks into one canvas: the displayed disk
    # must grow monotonically and end covering the whole scan (not an
    # isolated per-chunk strip)
    widths = [shape[1] for name, shape in seen if name == "disk"]
    assert widths == sorted(widths)
    assert widths[-1] >= scan.frames
