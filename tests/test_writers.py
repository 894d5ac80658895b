"""Overlapped product-file writer pool (io/writers.py)."""

import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.io import writers


def test_submit_barrier_roundtrip(tmp_path):
    paths = [str(tmp_path / f"f{i}.npy") for i in range(8)]
    for i, p in enumerate(paths):
        writers.submit(np.save, p, np.full(16, i))
    writers.barrier()
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.load(p), np.full(16, i))


def test_worker_error_surfaces_at_barrier(tmp_path):
    def boom():
        raise RuntimeError("disk full")

    ok = str(tmp_path / "ok.npy")
    writers.submit(boom)
    writers.submit(np.save, ok, np.arange(4))
    with pytest.raises(RuntimeError, match="disk full"):
        writers.barrier()
    # the barrier drained everything: later writes are unaffected
    assert os.path.exists(ok)
    writers.submit(np.save, ok, np.arange(5))
    writers.barrier()
    assert np.load(ok).shape == (5,)


def test_sync_env_var_runs_inline(tmp_path, monkeypatch):
    monkeypatch.setenv("SOLEX_SYNC_WRITES", "1")
    p = str(tmp_path / "s.npy")
    writers.submit(np.save, p, np.arange(3))
    # no barrier needed: the write already happened on this thread
    np.testing.assert_array_equal(np.load(p), np.arange(3))


def test_pipeline_joins_writes_before_return(tmp_path):
    """process_file must not return before every DATA product file exists
    (the writer pool is an implementation detail of the stage timing).
    Diagnostic figures ride the deferred lane and are guaranteed by
    figure_barrier(), which the CLI joins after the batch."""
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.io.writers import figure_barrier
    from solex_ser_recon_en_tpu.pipeline.run import process_file

    path = str(tmp_path / "w.ser")
    SyntheticScan(ih=128, iw=64, frames=60, depth=16,
                  line_poly=(30.0, 0.02, -1e-4, 0.0), noise=0.003,
                  seed=9).write(path, transpose_to_wide=True)
    outdir = tmp_path / "out"
    outdir.mkdir()
    opts = Options(shift=[0], save_fit=True, transversalium=True,
                   output_dir=str(outdir))
    process_file(path, opts)
    names = {p.name for p in outdir.iterdir()}
    for want in ("w_mean.fits", "w_shift=0_raw.fits",
                 "w_shift=0_circular.fits",
                 "w_shift=0_detransversaliumed.fits", "w_shift=0_clahe.fits",
                 "w_shift=0_clahe.png", "w_shift=0_protus.png",
                 "w_shift=0_uncontrasted.png", "w_shift=0_high_contrast.png"):
        assert want in names, want
    figure_barrier()
    names = {p.name for p in outdir.iterdir()}
    for want in ("w_shift=0_transversalium_correction.png",
                 "w_spectral_line_data.png", "w_shift=10_ellipse_fit.png"):
        assert want in names, want
