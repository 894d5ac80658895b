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


def test_products_match_reference_cv2(golden_scan):
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.pipeline.products import _products_core

    _, _, _, disks = _run_device(golden_scan, [0])
    disk = np.ascontiguousarray(np.asarray(disks[0]))  # cv2 needs host C-order
    cl1, cc, hc, protus = (np.asarray(a) for a in _products_core(jnp.asarray(disk)))
    cc_ref, hc_ref = ref.cpu_products(disk)
    assert np.abs(cc.astype(int) - cc_ref.astype(int)).max() <= 4
    assert np.abs(hc.astype(int) - hc_ref.astype(int)).max() <= 4
