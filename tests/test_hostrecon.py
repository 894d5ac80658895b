"""Host float64 recon (feed_mode='host') vs the device kernels and e2e.

The host path is the minimum-link-bytes feed for throttled-relay hosts
(io/hostreduce.host_reconstruct); it must agree with the device one-hot
matmul within the same 1-LSB tolerance the golden tests grant, across both
storage orientations and both bit depths.
"""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io.ser import SerReader, write_ser
from solex_ser_recon_en_tpu.io.hostreduce import host_reconstruct
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
from solex_ser_recon_en_tpu.pipeline.run import process_file, read_scan


@pytest.mark.parametrize("depth,wide", [(16, True), (16, False), (8, True)])
def test_host_recon_matches_device(tmp_path, depth, wide):
    path = str(tmp_path / f"s{depth}{wide}.ser")
    scan = SyntheticScan(ih=128, iw=64, frames=60, depth=depth,
                         line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                         seed=9)
    scan.write(path, transpose_to_wide=wide)
    r = SerReader(path)

    curve = 30.0 + 0.02 * np.arange(r.ih) - 1e-4 * np.arange(r.ih) ** 2
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [10, 0, -3]

    host = host_reconstruct(r, floor, frac, shifts, chunk_frames=17)

    from solex_ser_recon_en_tpu.ops.recon import reconstruct
    from solex_ser_recon_en_tpu.io.video import open_video

    frames = open_video(path).read_all()
    dev = np.asarray(reconstruct(frames, floor, frac, shifts))
    diff = np.abs(host.astype(int) - dev.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_host_feed_mode_end_to_end(basic_scan, tmp_path):
    """feed_mode='host' produces the same products as the default device
    feed within 1 LSB of disk difference propagated through fixed geometry."""
    def run(name, **kw):
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), **kw)
        scan = read_scan(basic_scan["path"], opts)
        return np.asarray(scan.disk_list)

    d_dev = run("dev", feed_mode="device")
    d_host = run("host", feed_mode="host")
    assert d_host.dtype == np.uint16
    diff = np.abs(d_dev.astype(int) - d_host.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize("depth,wide", [(16, True), (16, False), (8, True)])
@pytest.mark.parametrize("native", [True, False])
def test_fused_mean_max_band(tmp_path, depth, wide, native, monkeypatch):
    """One-sweep mean/max+band == separate host_mean_max + extract_band,
    on both the native kernel and the numpy fallback."""
    from solex_ser_recon_en_tpu.io import hostreduce, native as native_mod
    from solex_ser_recon_en_tpu.io.hostreduce import (
        extract_band,
        host_mean_max,
        host_mean_max_band,
    )

    if not native:
        def boom(path):
            raise RuntimeError("forced fallback")

        monkeypatch.setattr(native_mod, "NativeSerReader", boom)

    path = str(tmp_path / f"f{depth}{wide}{native}.ser")
    scan = SyntheticScan(ih=96, iw=48, frames=37, depth=depth,
                         line_poly=(22.0, 0.01, 0.0, 0.0), noise=0.004,
                         seed=3)
    scan.write(path, transpose_to_wide=wide)
    r = SerReader(path)

    mean0, max0 = host_mean_max(r)
    x0, x1 = 14, 33
    mean1, max1, band = host_mean_max_band(r, x0, x1)
    np.testing.assert_array_equal(mean0, mean1)
    np.testing.assert_array_equal(max0, max1)
    want = np.concatenate(
        [extract_band(r, x0, x1, s, min(10, r.frame_count - s))
         for s in range(0, r.frame_count, 10)]
    )
    np.testing.assert_array_equal(band, want)


@pytest.mark.parametrize("depth,wide", [(16, True), (16, False), (8, True)])
def test_reconstruct_from_band_bit_identical(tmp_path, depth, wide):
    from solex_ser_recon_en_tpu.io.hostreduce import (
        band_covers,
        host_mean_max_band,
        host_reconstruct_from_band,
    )

    path = str(tmp_path / f"b{depth}{wide}.ser")
    scan = SyntheticScan(ih=128, iw=64, frames=60, depth=depth,
                         line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                         seed=9)
    scan.write(path, transpose_to_wide=wide)
    r = SerReader(path)

    curve = 30.0 + 0.02 * np.arange(r.ih) - 1e-4 * np.arange(r.ih) ** 2
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [10, 0, -3]

    from solex_ser_recon_en_tpu.io.hostreduce import spectral_band

    x0, x1 = spectral_band(floor, shifts, r.iw, margin=4)
    assert band_covers(x0, x1, floor, frac, shifts, r.iw)
    _, _, band = host_mean_max_band(r, x0, x1)
    got = host_reconstruct_from_band(r, band, x0, floor, frac, shifts,
                                     chunk_frames=17)
    want = host_reconstruct(r, floor, frac, shifts, chunk_frames=17)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("depth,wide", [(16, True), (16, False), (8, True)])
def test_native_recon_bit_identical_to_numpy(tmp_path, depth, wide,
                                             monkeypatch):
    """The native fused pass-B gather (ser_recon_f64) must be BIT-IDENTICAL
    to the numpy host path — same f64 multiply/multiply/add order, same
    truncating u16 store — on both orientations, both depths, and both the
    full-scan memmap and the compact band slab sources."""
    from solex_ser_recon_en_tpu.io import hostreduce
    from solex_ser_recon_en_tpu.io.native import get_lib
    from solex_ser_recon_en_tpu.io.hostreduce import (
        band_covers,
        host_mean_max_band,
        host_reconstruct_from_band,
        spectral_band,
    )

    if get_lib() is None:
        pytest.skip("no native toolchain")

    path = str(tmp_path / f"n{depth}{wide}.ser")
    scan = SyntheticScan(ih=128, iw=64, frames=61, depth=depth,
                         line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                         seed=21)
    scan.write(path, transpose_to_wide=wide)
    r = SerReader(path)
    curve = 30.0 + 0.02 * np.arange(r.ih) - 1e-4 * np.arange(r.ih) ** 2
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [10, 0, -3]

    native = host_reconstruct(r, floor, frac, shifts, chunk_frames=17)
    monkeypatch.setenv("SOLEX_NO_NATIVE", "1")
    numpy_ = host_reconstruct(r, floor, frac, shifts, chunk_frames=17)
    np.testing.assert_array_equal(native, numpy_)

    monkeypatch.delenv("SOLEX_NO_NATIVE")
    x0, x1 = spectral_band(floor, shifts, r.iw, margin=4)
    assert band_covers(x0, x1, floor, frac, shifts, r.iw)
    _, _, band = host_mean_max_band(r, x0, x1)
    nb = host_reconstruct_from_band(r, band, x0, floor, frac, shifts,
                                    chunk_frames=17)
    monkeypatch.setenv("SOLEX_NO_NATIVE", "1")
    pb = host_reconstruct_from_band(r, band, x0, floor, frac, shifts,
                                    chunk_frames=17)
    np.testing.assert_array_equal(nb, pb)
    np.testing.assert_array_equal(nb, numpy_)


def test_provisional_band_covers_final_fit(basic_scan):
    from solex_ser_recon_en_tpu.geometry import fit_spectral_line
    from solex_ser_recon_en_tpu.io.hostreduce import (
        band_covers,
        host_mean_max,
        provisional_spectral_band,
    )

    r = SerReader(basic_scan["path"])
    shifts = [10, 0]
    x0, x1 = provisional_spectral_band(r, shifts)
    mean, mx = host_mean_max(r)
    lf = fit_spectral_line(mean, mx)
    assert band_covers(x0, x1, lf.floor, lf.frac, shifts, r.iw)


def test_fused_host_feed_bit_identical_to_classic(basic_scan, tmp_path,
                                                  monkeypatch):
    """read_scan(feed='host') with the fused sweep == classic two-pass."""
    def run(name, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="host")
        scan = read_scan(basic_scan["path"], opts)
        for k in env:
            monkeypatch.delenv(k)
        return np.asarray(scan.disk_list)

    d_fused = run("fused", {"SOLEX_FUSEDBAND": "1"})
    d_classic = run("classic", {"SOLEX_NO_FUSEDBAND": "1"})
    np.testing.assert_array_equal(d_fused, d_classic)


def test_fused_band_miss_falls_back(basic_scan, tmp_path, monkeypatch):
    """A wrong provisional band must not change the result — the coverage
    check rejects it and the recon falls back to the full-scan gather."""
    from solex_ser_recon_en_tpu.pipeline import run as run_mod
    import solex_ser_recon_en_tpu.io.hostreduce as hr

    monkeypatch.setattr(hr, "provisional_spectral_band",
                        lambda r, shifts, **kw: (0, 8))
    monkeypatch.setenv("SOLEX_FUSEDBAND", "1")
    outdir = tmp_path / "miss"
    outdir.mkdir()
    opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                   output_dir=str(outdir), feed_mode="host")
    scan = read_scan(basic_scan["path"], opts)

    monkeypatch.setenv("SOLEX_NO_FUSEDBAND", "1")
    outdir2 = tmp_path / "ref"
    outdir2.mkdir()
    opts2 = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                    output_dir=str(outdir2), feed_mode="host")
    ref = read_scan(basic_scan["path"], opts2)
    np.testing.assert_array_equal(np.asarray(scan.disk_list),
                                  np.asarray(ref.disk_list))


def test_host_feed_full_products(basic_scan, tmp_path):
    outdir = tmp_path / "p"
    outdir.mkdir()
    opts = Options(shift=[0], save_fit=True, transversalium=True,
                   output_dir=str(outdir), feed_mode="host")
    results = process_file(basic_scan["path"], opts)
    assert results
    names = {p.name for p in outdir.iterdir()}
    assert any(n.endswith("_clahe.png") for n in names)
    assert any(n.endswith("_raw.fits") for n in names)


# ---------------------------------------------------------------------------
# Two-step fast pass A (io/hostreduce.py:fast_passa): a frame subsample
# locates the band, a full-frame-count native sweep touches only the band
# bytes, and the banded fit must be BIT-identical to the full-sweep fit
# whenever its verification gates pass.
# ---------------------------------------------------------------------------


def _wide_line_scan(tmp_path, wide=True, depth=16, name="fp.ser"):
    """A scan whose spectral window is wide enough that the recon band is a
    small fraction of it (fast_passa rejects bands covering >=1/3 of iw)."""
    path = str(tmp_path / name)
    scan = SyntheticScan(ih=320, iw=224, frames=200, depth=depth,
                         line_poly=(112.0, 0.02, -1e-4, 0.0), noise=0.002,
                         seed=5)
    scan.write(path, transpose_to_wide=wide)
    return path


@pytest.mark.parametrize("depth,wide", [(16, True), (16, False), (8, True)])
def test_native_sample_band_stats_match_numpy(tmp_path, depth, wide):
    from solex_ser_recon_en_tpu.io.native import NativeSerReader

    path = _wide_line_scan(tmp_path, wide=wide, depth=depth)
    r = SerReader(path)
    raw = r.raw_frames()  # (F, H, W) on-disk layout

    nr = NativeSerReader(path)
    try:
        if not hasattr(nr._lib, "ser_sample_stats"):
            pytest.skip("native lib predates ser_sample_stats")
        step = 7
        s, m, n = nr.sample_stats(step)
        sub = raw[::step].astype(np.uint64)
        assert n == sub.shape[0]
        np.testing.assert_array_equal(s, sub.sum(axis=0))
        np.testing.assert_array_equal(m, raw[::step].max(axis=0))

        H, W = raw.shape[1], raw.shape[2]
        r0, r1, c0, c1 = H // 8, H - H // 8, W // 16, W - W // 16
        sb, mb = nr.band_stats(r0, r1, c0, c1)
        rect = raw[:, r0:r1, c0:c1]
        np.testing.assert_array_equal(sb, rect.astype(np.uint64).sum(axis=0))
        np.testing.assert_array_equal(mb, rect.max(axis=0))
    finally:
        nr.close()


@pytest.mark.parametrize("wide", [True, False])
def test_fast_passa_fit_bit_identical(tmp_path, monkeypatch, wide):
    from solex_ser_recon_en_tpu.geometry.linefit import fit_spectral_line
    from solex_ser_recon_en_tpu.io.hostreduce import fast_passa, host_mean_max

    monkeypatch.setenv("SOLEX_FASTPASSA_MIN_MB", "0")
    path = _wide_line_scan(tmp_path, wide=wide)
    r = SerReader(path)
    fast = fast_passa(r, [10, 0])
    assert fast is not None, "verification gates must pass on a clean scan"
    lf, mean_band, max_band, x0, x1 = fast

    mean_img, max_img = host_mean_max(r)
    lf_full = fit_spectral_line(np.asarray(mean_img), np.asarray(max_img))
    np.testing.assert_array_equal(lf.poly, lf_full.poly)
    np.testing.assert_array_equal(lf.curve, lf_full.curve)
    assert (lf.y1, lf.y2) == (lf_full.y1, lf_full.y2)
    # the banded stats equal the full sweep's restricted to [x0, x1)
    np.testing.assert_array_equal(mean_band, np.asarray(mean_img)[:, x0:x1])
    np.testing.assert_array_equal(max_band, np.asarray(max_img)[:, x0:x1])


def test_fast_passa_e2e_bit_identical(tmp_path, monkeypatch):
    path = _wide_line_scan(tmp_path)

    def run(name, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="host")
        scan = read_scan(path, opts)
        for k in env:
            monkeypatch.delenv(k)
        return np.asarray(scan.disk_list)

    import solex_ser_recon_en_tpu.io.hostreduce as hr

    calls = []
    real = hr.fast_passa

    def spy(r, shifts, **kw):
        out = real(r, shifts, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(hr, "fast_passa", spy)
    d_fast = run("fast", {"SOLEX_FASTPASSA_MIN_MB": "0"})
    assert calls == [True], "fast pass A must actually be taken"
    d_classic = run("classic", {"SOLEX_NO_FASTPASSA": "1"})
    np.testing.assert_array_equal(d_fast, d_classic)


def test_fast_passa_gates(tmp_path, monkeypatch, basic_scan):
    from solex_ser_recon_en_tpu.io.hostreduce import fast_passa

    monkeypatch.setenv("SOLEX_FASTPASSA_MIN_MB", "0")
    # SOLEX_EXACT_PASSA forces the classic full sweep
    monkeypatch.setenv("SOLEX_EXACT_PASSA", "1")
    r = SerReader(_wide_line_scan(tmp_path))
    assert fast_passa(r, [10, 0]) is None
    monkeypatch.delenv("SOLEX_EXACT_PASSA")

    # a band covering most of the frame is not worth the two-step
    rb = SerReader(basic_scan["path"])  # iw=96: band/3 >= iw
    assert fast_passa(rb, [10, 0]) is None

    # below the size floor the classic sweep wins
    monkeypatch.setenv("SOLEX_FASTPASSA_MIN_MB", "100000")
    assert fast_passa(r, [10, 0]) is None


def test_deferred_spectral_figure_byte_identical(tmp_path, monkeypatch):
    """Figure modes keep the banded fast pass A: the full-frame mean sweep
    moves into the deferred figure lane (pipeline/plots.py:
    deferred_spectral_line_plot) and the rendered _spectral_line_data.png
    is BYTE-identical to the inline full-sweep path's figure."""
    from solex_ser_recon_en_tpu.io.writers import figure_barrier
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    path = _wide_line_scan(tmp_path)

    import solex_ser_recon_en_tpu.io.hostreduce as hr

    calls = []
    real = hr.fast_passa

    def spy(r, shifts, **kw):
        out = real(r, shifts, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(hr, "fast_passa", spy)

    def run(name, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        outdir = tmp_path / name
        outdir.mkdir()
        # figure mode: not clahe/protus-only, logging on
        opts = Options(shift=[0], ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="host")
        read_scan(path, opts)
        figure_barrier()
        for k in env:
            monkeypatch.delenv(k)
        import os as _os

        fig = outdir / (_os.path.basename(path).rsplit(".", 1)[0]
                        + "_spectral_line_data.png")
        assert fig.exists(), list(outdir.iterdir())
        return fig.read_bytes()

    deferred = run("deferred", {"SOLEX_FASTPASSA_MIN_MB": "0"})
    assert calls == [True], "figure mode must take the banded fast pass"
    inline = run("inline", {"SOLEX_NO_FASTPASSA": "1"})
    assert deferred == inline
