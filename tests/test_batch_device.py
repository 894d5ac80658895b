"""Folder-batch device batching (pipeline/batch.py): groups of same-shape
small scans run mean/max + recon as ONE vmapped device program
(parallel/mesh.device_recon_batch), sharded over a ('batch','frame') mesh.
"""

import os

import numpy as np

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan


def _mk_batch(tmp_path, n=4, n_avi=0):
    scan = SyntheticScan(ih=96, iw=64, frames=40, depth=16,
                         line_poly=(32.0, 0.01, 0.0, 0.0), noise=0.002,
                         seed=7)
    files = []
    for i in range(n):
        p = str(tmp_path / f"b{i}.ser")
        scan.write(p, transpose_to_wide=True)
        files.append(p)
    if n_avi:
        import cv2

        base = scan.generate()
        frames8 = (base >> 8).astype(np.uint8)
        h, w = frames8.shape[1:]
        for i in range(n_avi):
            p = str(tmp_path / f"a{i}.avi")
            vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"Y800"), 30,
                                 (w, h), isColor=False)
            for f in frames8:
                vw.write(f)
            vw.release()
            files.append(p)
    return files


def test_batched_recon_matches_per_file(tmp_path, monkeypatch):
    import jax

    from solex_ser_recon_en_tpu.ops.recon import build_shift_indices, reconstruct
    from solex_ser_recon_en_tpu.parallel.mesh import device_recon_batch, make_mesh
    from solex_ser_recon_en_tpu.io.video import open_video

    files = _mk_batch(tmp_path, 2)
    frames = np.stack([np.asarray(open_video(f).read_all()) for f in files])
    B, F, ih, iw = frames.shape
    curve = 32.0 + 0.01 * np.arange(ih)
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [10, 0]
    ind_l, left_w = build_shift_indices(floor, frac, shifts, iw)
    ind_b = np.broadcast_to(ind_l, (B,) + ind_l.shape)
    w_b = np.broadcast_to(left_w, (B,) + left_w.shape)

    raw_b = device_recon_batch(frames, ind_b, w_b)
    for i in range(B):
        per = np.asarray(reconstruct(frames[i], floor, frac, shifts,
                                     kernel="onehot"))
        np.testing.assert_array_equal(np.asarray(raw_b[i]), per)

    # sharded over a ('batch', 'frame') mesh: bit-identical to unsharded
    devs = jax.devices()
    if len(devs) >= 4:
        mesh = make_mesh({"batch": 2, "frame": 2}, devs[:4])
        r2 = device_recon_batch(frames, ind_b, w_b, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(raw_b))


def test_handle_files_batches_same_shape_scans(tmp_path, monkeypatch):
    """With a mesh (the accelerator stand-in), handle_files routes the
    whole same-shape group through the batched reader — proven by making
    the per-file read_scan raise — and products match the unbatched run."""
    import sys

    import jax

    from solex_ser_recon_en_tpu.cli.main import handle_files

    cli_main = sys.modules["solex_ser_recon_en_tpu.cli.main"]

    # the mesh={"frame": 2} stand-in needs 2 devices; on a single real
    # chip (SOLEX_TEST_TPU=1) the mesh must FALL BACK to per-file
    # processing with per-file-identical outputs — asserted below instead
    # of skipping (VERDICT r4 item 6)
    single_chip = len(jax.devices()) < 2

    files = _mk_batch(tmp_path, 4, n_avi=2)  # mixed SER + AVI, same shape
    monkeypatch.setenv("SOLEX_BATCH_MIN_FILES", "3")

    def run(outname):
        outdir = tmp_path / outname
        outdir.mkdir()
        # real ellipse fit (ratio_fixe's backup-bounds strip would span
        # the synthetic AVI's exact-zero borders -> inf log ratios, a
        # pre-existing corpus/option interaction in BOTH paths)
        opts = Options(shift=[0], clahe_only=True, output_dir=str(outdir),
                       mesh={"frame": 2})
        done = handle_files(list(files), opts)
        assert done == 6, done
        return outdir

    from solex_ser_recon_en_tpu.io import read_image

    # plain per-file run first (batching disabled)
    monkeypatch.setenv("SOLEX_NO_DEVICE_BATCH", "1")
    plain = run("plain")
    monkeypatch.delenv("SOLEX_NO_DEVICE_BATCH")
    if single_chip:
        # fallback leg: the per-file path MUST run (no poison) and its
        # products must be byte-identical to the plain run's
        batched = run("batched")
        prods_b = sorted(p.name for p in batched.iterdir()
                         if p.suffix == ".png")
        prods_p = sorted(p.name for p in plain.iterdir()
                         if p.suffix == ".png")
        assert prods_b == prods_p and len(prods_b) == 6
        for name in prods_b:
            a = np.asarray(read_image(str(batched / name)), dtype=np.int64)
            b = np.asarray(read_image(str(plain / name)), dtype=np.int64)
            np.testing.assert_array_equal(a, b, err_msg=name)
        return
    # batched run: read_scan poisoned, so only the batched reader can
    # produce the ScanResults

    def boom(*a, **k):
        raise AssertionError("per-file read_scan must not run")

    monkeypatch.setattr(cli_main, "read_scan", boom)
    batched = run("batched")
    prods_b = sorted(p.name for p in batched.iterdir() if p.suffix == ".png")
    prods_p = sorted(p.name for p in plain.iterdir() if p.suffix == ".png")
    assert prods_b == prods_p and len(prods_b) == 6
    for name in prods_b:
        a = np.asarray(read_image(str(batched / name)), dtype=np.int64)
        b = np.asarray(read_image(str(plain / name)), dtype=np.int64)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 3, name  # stretch amplifies 1 LSB


def test_batched_reader_applies_flip_x(tmp_path, monkeypatch):
    """options.flip_x must mirror batched disks exactly like read_scan
    (review finding: the batched reader silently dropped the mirror)."""
    import sys

    import jax

    from solex_ser_recon_en_tpu.cli.main import handle_files

    cli_main = sys.modules["solex_ser_recon_en_tpu.cli.main"]
    single_chip = len(jax.devices()) < 2  # fallback variant, see above
    files = _mk_batch(tmp_path, 3)
    monkeypatch.setenv("SOLEX_BATCH_MIN_FILES", "3")

    def run(outname):
        outdir = tmp_path / outname
        outdir.mkdir()
        opts = Options(shift=[0], clahe_only=True, flip_x=True,
                       output_dir=str(outdir), mesh={"frame": 2})
        assert handle_files(list(files), opts) == 3
        return outdir

    monkeypatch.setenv("SOLEX_NO_DEVICE_BATCH", "1")
    plain = run("plain")
    monkeypatch.delenv("SOLEX_NO_DEVICE_BATCH")

    if not single_chip:
        def boom(*a, **k):
            raise AssertionError("per-file read_scan must not run")

        monkeypatch.setattr(cli_main, "read_scan", boom)
    batched = run("batched")

    from solex_ser_recon_en_tpu.io import read_image

    for p in sorted(plain.iterdir()):
        if p.suffix != ".png":
            continue
        a = np.asarray(read_image(str(batched / p.name)), dtype=np.int64)
        b = np.asarray(read_image(str(p)), dtype=np.int64)
        assert a.shape == b.shape
        if single_chip:
            # mesh fell back to the per-file path: byte-identical
            np.testing.assert_array_equal(a, b, err_msg=p.name)
        else:
            assert np.abs(a - b).max() <= 3, p.name
