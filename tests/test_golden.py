"""Golden parity: the device pipeline vs the reference-semantics replica.

utils/cpu_reference.py reimplements the reference's per-frame hot loops
exactly (streaming buffered reads, uint64 mean, per-frame fancy-indexed
gather-lerp, cv2 CLAHE); here the full TPU path must match it on the same
scan within interpolation tolerance (BASELINE.md north star).
"""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.geometry import fit_spectral_line
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.io.feeder import raw_device_chunks
from solex_ser_recon_en_tpu.io.video import open_video
from solex_ser_recon_en_tpu.ops.fused import RawScanProcessor
from solex_ser_recon_en_tpu.utils import cpu_reference as ref


@pytest.fixture(scope="module")
def golden_scan(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("golden") / "g.ser")
    scan = SyntheticScan(
        ih=256, iw=96, frames=180, depth=16,
        line_poly=(48.0, 0.01, -5e-5, 0.0),
        trans_stripes=0.08, noise=0.002, seed=17,
    )
    scan.write(path, transpose_to_wide=True)
    return path


def _run_device(path, shifts):
    vid = open_video(path)
    it, rotate, upscale = raw_device_chunks(vid, 64)
    proc = RawScanProcessor(vid.Height, vid.Width, rotate, upscale,
                            frame_count=vid.frame_count)
    for s, c in it:
        proc.accumulate(s, c)
    mean_img, max_img = proc.mean_max()
    lf = fit_spectral_line(mean_img, max_img)
    disks = proc.reconstruct(lf.floor, lf.frac, shifts)
    return mean_img, max_img, lf, disks


def test_mean_max_bit_exact(golden_scan):
    mean_d, max_d = _run_device(golden_scan, [0])[:2]
    mean_c, max_c = ref.cpu_mean_max(golden_scan)
    np.testing.assert_array_equal(mean_d, mean_c)
    np.testing.assert_array_equal(max_d, max_c)


def test_disks_match_reference_loop(golden_scan):
    shifts = [10, 0, -4]
    mean_d, max_d, lf, disks_d = _run_device(golden_scan, shifts)
    fit = np.stack([lf.floor.astype(np.float64), lf.frac], axis=1)
    disks_c = ref.cpu_recon(golden_scan, fit, shifts)
    for i in range(len(shifts)):
        diff = np.abs(disks_d[i].astype(int) - disks_c[i].astype(int))
        assert diff.max() <= 1, f"shift {shifts[i]}: max {diff.max()}"
        assert (diff > 0).mean() < 0.02


def test_cpu_replica_config_extensions(golden_scan, tmp_path):
    """The bench's per-config CPU replicas (transversalium, FITS/PNG
    writes, protus paint, rotate, fixed-width crop, multi-shift) run and
    emit the same product set the TPU configs write — keeps the paired
    vs_baseline denominators honest."""
    out = tmp_path / "rep"
    out.mkdir()
    dt = ref.cpu_pipeline(
        golden_scan, [0], transversalium=True, save_dir=str(out),
        save_fits=True, protus=True, img_rotate=90, fixed_width=200,
    )
    assert dt > 0
    names = {p.name for p in out.iterdir()}
    assert {"g_mean.fits", "g_shift=0_raw.fits", "g_shift=0_circular.fits",
            "g_shift=0_detransversaliumed.fits", "g_shift=0_clahe.fits",
            "g_shift=0_clahe.png", "g_shift=0_protus.png",
            "g_shift=0_uncontrasted.png",
            "g_shift=0_high_contrast.png"} <= names
    # multi-shift sweep replica: one product set per shift, no files
    assert ref.cpu_pipeline(golden_scan, [-2, 0, 2]) > 0


def test_cpu_replica_avi_reader(tmp_path):
    """AVI scans route through the cv2.VideoCapture replica source
    (video_reader.py:68-80 semantics), matching the SER replica on the
    same underlying frames."""
    cv2 = pytest.importorskip("cv2")
    scan = SyntheticScan(ih=96, iw=48, frames=40, depth=16,
                         line_poly=(22.0, 0.01, 0.0, 0.0), seed=3)
    base = scan.generate()
    frames8 = (base >> 8).astype(np.uint8)
    h, w = frames8.shape[1:]
    path = str(tmp_path / "a.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"Y800"), 30,
                         (w, h), isColor=False)
    if not vw.isOpened():
        pytest.skip("no AVI encoder in this cv2 build")
    for f in frames8:
        vw.write(f)
    vw.release()
    mean_a, max_a = ref.cpu_mean_max(path)
    assert mean_a.shape == (max(h, w), min(h, w))
    assert max_a.max() > 0
    assert ref.cpu_pipeline(path, [0]) > 0


def test_products_match_reference_cv2(golden_scan):
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.pipeline.products import _products_core

    _, _, _, disks = _run_device(golden_scan, [0])
    disk = np.ascontiguousarray(np.asarray(disks[0]))  # cv2 needs host C-order
    cl1, cc, hc, protus = (np.asarray(a) for a in _products_core(jnp.asarray(disk)))
    cc_ref, hc_ref = ref.cpu_products(disk)
    assert np.abs(cc.astype(int) - cc_ref.astype(int)).max() <= 4
    assert np.abs(hc.astype(int) - hc_ref.astype(int)).max() <= 4


def test_cpu_replica_ellipse_warp_stage():
    """The replica's geometry stage (cpu_ellipse_warp) fits a clean disk
    and circularises the requested shifts — the paired vs_baseline
    denominator charges the reference the warps it always runs
    (Solex_recon.py:105-133); a featureless disk degrades to the unwarped
    passthrough the reference's fit-failure path takes."""
    yy, xx = np.mgrid[0:240, 0:260].astype(np.float64)
    # tilted ellipse disk, reference-scale brightness
    e = (((xx - 130) + 0.15 * (yy - 120)) / 80) ** 2 + ((yy - 120) / 95) ** 2
    disk = np.where(e < 1.0, 42000, 900).astype(np.uint16)
    warped, circle = ref.cpu_ellipse_warp([disk, disk], [1])
    assert circle is not None
    assert len(warped) == 1 and warped[0].dtype == np.uint16
    # circularisation keeps the disk area (radius between the axes)
    assert 70 <= circle[2] <= 110
    # edge-free input: fit fails, disks pass through unwarped (the
    # reference's manual-fallback path, README.md:110)
    flat = np.zeros((64, 64), np.uint16)
    warped, circle = ref.cpu_ellipse_warp([flat, flat], [1])
    assert circle is None
    np.testing.assert_array_equal(warped[0], flat)


def test_cpu_replica_hidden_shifts_and_figures(golden_scan, tmp_path):
    """cpu_pipeline reconstructs the reference's hidden [10, 0] shifts and
    emits the 4-panel _ellipse_fit.png in figure modes when the fit
    succeeds (ellipse_to_circle.py:316-341) — or no figure when it falls
    back; either way the run completes with the product set."""
    out = tmp_path / "fig"
    out.mkdir()
    dt = ref.cpu_pipeline(golden_scan, [0], save_dir=str(out), figures=True)
    assert dt > 0
    names = {p.name for p in out.iterdir()}
    assert "g_shift=0_clahe.png" in names
    assert "g_spectral_line_data.png" in names


def test_cpu_replica_clahe_only_reference_save_set(golden_scan, tmp_path):
    """The -c replica leg writes EXACTLY what the reference's clahe_only
    mode writes — one _clahe.png per shift, nothing else (solex_util.py:
    556-566 gates; transversalium still runs, SHG_MAIN.py:53 default) —
    so the paired vs_baseline denominator neither over- nor under-counts
    product IO."""
    out = tmp_path / "conly"
    out.mkdir()
    dt = ref.cpu_pipeline(golden_scan, [-1, 0], clahe_only=True,
                          transversalium=True, save_dir=str(out))
    assert dt > 0
    names = sorted(p.name for p in out.iterdir())
    assert names == ["g_shift=-1_clahe.png", "g_shift=0_clahe.png"], names
