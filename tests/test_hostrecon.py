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
