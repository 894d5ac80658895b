"""Raw-layout fused path equivalence tests."""

import jax
import numpy as np
import pytest

from solex_ser_recon_en_tpu.ops.fused import RawScanProcessor
from solex_ser_recon_en_tpu.ops.recon import reconstruct
from solex_ser_recon_en_tpu.ops.reduce import mean_max


@pytest.mark.parametrize("rotate,upscale", [(True, False), (False, False),
                                            (True, True), (False, True)])
def test_raw_processor_matches_normalized_path(rng, rotate, upscale):
    F = 40
    if rotate:
        H, W = 24, 64          # wide storage: ih=64, iw=24
    else:
        H, W = 64, 24
    dtype = np.uint8 if upscale else np.uint16
    hi = 256 if upscale else 65536
    raw = rng.integers(0, hi, size=(F, H, W), dtype=dtype)

    # normalised frames as the reference defines them
    norm = raw
    if rotate:
        norm = np.rot90(norm, axes=(1, 2))
    norm = norm.astype(np.uint16)
    if upscale:
        norm = norm << 8

    proc = RawScanProcessor(H, W, rotate, upscale)
    step = 13
    for s in range(0, F, step):
        proc.accumulate(s, jax.device_put(raw[s : s + step]))
    mean_r, max_r = proc.mean_max()
    mean_n, max_n = mean_max(norm)
    np.testing.assert_array_equal(mean_r, mean_n)
    np.testing.assert_array_equal(max_r, max_n)

    ih = proc.ih
    curve = proc.iw / 2 + 0.05 * np.arange(ih)
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [-5, 0, 3]
    disks_r = proc.reconstruct(floor, frac, shifts)
    disks_n = np.asarray(reconstruct(norm, floor, frac, shifts, kernel="onehot"))
    np.testing.assert_allclose(
        disks_r.astype(int), disks_n.astype(int), atol=1
    )
    assert (disks_r != disks_n).mean() < 0.02


def test_band_mode_matches_device_path(tmp_path, rng):
    """feed_mode='band' (host pass A + spectral-band transfer) produces the
    same disks as the full device path."""
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    p = str(tmp_path / "b.ser")
    scan = SyntheticScan(ih=200, iw=96, frames=150, depth=16,
                         line_poly=(48.0, 0.02, 0.0, 0.0), noise=0.002, seed=3)
    scan.write(p, transpose_to_wide=True)
    s_dev = read_scan(p, Options(shift=[0, 5], feed_mode="device", _nolog=True))
    s_band = read_scan(p, Options(shift=[0, 5], feed_mode="band", _nolog=True))
    np.testing.assert_array_equal(s_dev.mean_img, s_band.mean_img)
    assert s_dev.shifts == s_band.shifts
    d = np.abs(s_dev.disk_list.astype(int) - s_band.disk_list.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.02


def test_band_mode_8bit_and_tall(tmp_path, rng):
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    p = str(tmp_path / "c.ser")
    scan = SyntheticScan(ih=160, iw=64, frames=100, depth=8,
                         line_poly=(30.0, 0.0, 0.0, 0.0), noise=0.004, seed=8)
    scan.write(p)  # tall storage: no rotation
    s_dev = read_scan(p, Options(shift=[-3, 0], feed_mode="device", _nolog=True))
    s_band = read_scan(p, Options(shift=[-3, 0], feed_mode="band", _nolog=True))
    np.testing.assert_array_equal(s_dev.mean_img, s_band.mean_img)
    d = np.abs(s_dev.disk_list.astype(int) - s_band.disk_list.astype(int))
    assert d.max() <= 1


def test_band_feed_from_fused_slab(basic_scan, tmp_path, monkeypatch):
    """feed='band' with the fused sweep's slab as the transfer source is
    bit-identical to extracting per chunk from the memmap."""
    import numpy as np

    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    def run(name, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="band")
        scan = read_scan(basic_scan["path"], opts)
        for k in env:
            monkeypatch.delenv(k)
        return np.asarray(scan.disk_list)

    d_slab = run("slab", {"SOLEX_FUSEDBAND": "1"})
    d_mmap = run("mmap", {"SOLEX_NO_FUSEDBAND": "1"})
    np.testing.assert_array_equal(d_slab, d_mmap)
