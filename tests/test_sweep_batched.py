"""The vmapped Doppler-sweep post-processing equals the sequential path.

pipeline/run._finish_sweep batches the per-shift transversalium and product
core into single device programs (the reference loops per shift,
Solex_recon.py:105-133); these tests A/B it against the sequential path via
the _SWEEP_BATCHED escape hatch and assert identical products and files.
"""

import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
import solex_ser_recon_en_tpu.pipeline.run as runmod


def _run(scan_path, tmp_path, name, batched, **kw):
    outdir = tmp_path / name
    outdir.mkdir()
    kw.setdefault("save_fit", True)
    kw.setdefault("transversalium", True)
    opts = Options(shift=[-4, 0, 4], output_dir=str(outdir), **kw)
    old = runmod._SWEEP_BATCHED
    runmod._SWEEP_BATCHED = batched
    try:
        results = runmod.process_file(scan_path, opts)
    finally:
        runmod._SWEEP_BATCHED = old
    return results, outdir


def test_sweep_batched_equals_sequential(basic_scan, tmp_path):
    res_b, dir_b = _run(basic_scan["path"], tmp_path, "batched", True)
    res_s, dir_s = _run(basic_scan["path"], tmp_path, "seq", False)
    assert [s for s, _ in res_b] == [s for s, _ in res_s] == [0, -4, 4]
    for (s, out_b), (_, out_s) in zip(res_b, res_s):
        for img_b, img_s in zip(out_b, out_s):
            np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_s))
    files_b = sorted(os.listdir(dir_b))
    assert files_b == sorted(os.listdir(dir_s))
    for f in files_b:
        if f.endswith((".fits", ".png")):
            assert (dir_b / f).read_bytes() == (dir_s / f).read_bytes(), f


def test_sweep_batched_no_transversalium(basic_scan, tmp_path):
    res_b, _ = _run(basic_scan["path"], tmp_path, "nt_b", True,
                    transversalium=False, _nolog=True)
    res_s, _ = _run(basic_scan["path"], tmp_path, "nt_s", False,
                    transversalium=False, _nolog=True)
    for (s, out_b), (_, out_s) in zip(res_b, res_s):
        for img_b, img_s in zip(out_b, out_s):
            np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_s))


def test_sweep_crop_falls_back_to_sequential(basic_scan, tmp_path):
    """Crop modes keep the per-shift path (shapes change mid-chain)."""
    res, outdir = _run(basic_scan["path"], tmp_path, "crop", True,
                       crop_width_square=True, _nolog=True)
    assert [s for s, _ in res] == [0, -4, 4]
    h = np.asarray(res[0][1][0]).shape[0]
    assert np.asarray(res[0][1][0]).shape[1] == h  # square crop applied
