"""The PRODUCT pipeline under a device mesh must match single-device exactly.

The reference's parallelism contract is a 4-process pool over files
(Solex_recon.py:30-42); the TPU-native replacement shards the frame axis of
one scan over the mesh (zero-communication recon + psum mean/max,
SURVEY.md §5.7-5.8).  These tests run ``process_file`` with
``Options.mesh = {"frame": 8}`` on the 8-device virtual CPU mesh from
conftest and assert bit-identical products vs a plain single-device run.
"""

import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.pipeline.run import process_file


def _run(scan_path, tmp_path, name, **kw):
    outdir = tmp_path / name
    outdir.mkdir()
    opts = Options(shift=[0, 3], save_fit=True, transversalium=True,
                   output_dir=str(outdir), _nolog=True, **kw)
    results = process_file(scan_path, opts)
    return results, outdir


def _assert_identical(res_a, res_b, dir_a, dir_b):
    assert [s for s, _ in res_a] == [s for s, _ in res_b]
    for (s, out_a), (_, out_b) in zip(res_a, res_b):
        for img_a, img_b in zip(out_a, out_b):
            np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    files_a = sorted(os.listdir(dir_a))
    files_b = sorted(os.listdir(dir_b))
    assert files_a == files_b
    for f in files_a:
        if f.endswith((".fits", ".png")):
            a = (dir_a / f).read_bytes()
            b = (dir_b / f).read_bytes()
            assert a == b, f"{f} differs between mesh and single-device runs"


def test_process_file_frame_mesh_bit_identical(basic_scan, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    # feed_mode pinned: the property under test is that SHARDING doesn't
    # change results; on a CPU-only backend the auto feed policy would
    # (correctly) route the non-mesh run to the host pass instead
    res_1, dir_1 = _run(basic_scan["path"], tmp_path, "single",
                        feed_mode="device")
    res_8, dir_8 = _run(basic_scan["path"], tmp_path, "mesh",
                        mesh={"frame": 8})
    _assert_identical(res_1, res_8, dir_1, dir_8)


def test_process_file_band_mode_mesh_within_1lsb(basic_scan, tmp_path):
    """Band-feed recon under a mesh matches single-device within 1 LSB.

    Exact equality is not achievable here: the per-device matmul shape
    changes (F/8 vs F frames), and XLA's FMA chaining order inside the
    one-hot contraction shifts results by 1 f32 ULP, which the reference's
    truncating u16 cast exposes as a 1-LSB step (same tolerance the golden
    tests grant vs the reference itself).  Geometry is pinned so the ellipse
    fit cannot amplify that LSB.
    """
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    def disks(**kw):
        opts = Options(shift=[0, 3], _nolog=True, ratio_fixe=1.0,
                       slant_fix=0.0, output_dir=str(tmp_path),
                       feed_mode="band", **kw)
        return np.asarray(read_scan(basic_scan["path"], opts).disk_list)

    d_1 = disks()
    d_8 = disks(mesh={"frame": 8})
    diff = np.abs(d_1.astype(np.int64) - d_8.astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_mesh_too_large_degrades_to_single_device(basic_scan, tmp_path, capsys):
    res, _ = _run(basic_scan["path"], tmp_path, "big",
                  mesh={"frame": 4096})
    assert res
    assert "running single-device" in capsys.readouterr().out


def test_cli_mesh_flag():
    from solex_ser_recon_en_tpu.cli.flags import parse_cli

    opts = Options()
    files = parse_cli(opts, ["--mesh", "batch=2,frame=4", "-c", "x.ser"])
    assert opts.mesh == {"batch": 2, "frame": 4}
    assert opts.clahe_only
    assert files == ["x.ser"]

    opts2 = Options()
    parse_cli(opts2, ["--mesh=8"])
    assert opts2.mesh == {"frame": 8}


def test_cli_feed_flag():
    from solex_ser_recon_en_tpu.cli.flags import parse_cli

    opts = Options()
    files = parse_cli(opts, ["--feed", "host", "x.ser"])
    assert opts.feed_mode == "host" and files == ["x.ser"]
    opts2 = Options()
    parse_cli(opts2, ["--feed=band"])
    assert opts2.feed_mode == "band"
    with pytest.raises(SystemExit):
        parse_cli(Options(), ["--feed", "warp9"])
    with pytest.raises(SystemExit):
        parse_cli(Options(), ["--feed"])  # trailing, no mode
    with pytest.raises(SystemExit):
        parse_cli(Options(), ["--mesh"])  # trailing, no spec


def test_parse_mesh_spec_rejects_garbage():
    from solex_ser_recon_en_tpu.parallel.mesh import parse_mesh_spec

    with pytest.raises(ValueError):
        parse_mesh_spec("rows=3")
    with pytest.raises(ValueError):
        parse_mesh_spec("frame=")


def test_mesh_with_non_divisible_frame_count(tmp_path):
    """194 frames over 8 shards: the trailing chunk must pad to the bucket
    and recon output slice back to the true length, bit-identical to
    single-device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    p = str(tmp_path / "odd.ser")
    SyntheticScan(ih=128, iw=64, frames=194, depth=16,
                  line_poly=(30.0, 0.01, 0.0, 0.0), noise=0.002,
                  seed=6).write(p, transpose_to_wide=True)
    res_1, dir_1 = _run(p, tmp_path, "odd1", feed_mode="device")
    res_8, dir_8 = _run(p, tmp_path, "odd8", mesh={"frame": 8})
    _assert_identical(res_1, res_8, dir_1, dir_8)
    from solex_ser_recon_en_tpu.io.fits import read_fits

    raw = read_fits(str(dir_8 / "odd_shift=0_raw.fits"))[0]
    assert raw.shape[1] == 194  # padded bucket sliced back to true length
