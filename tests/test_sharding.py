"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from solex_ser_recon_en_tpu.models.shg import shg_forward, example_inputs
from solex_ser_recon_en_tpu.ops.recon import build_shift_indices, reconstruct
from solex_ser_recon_en_tpu.parallel.mesh import (
    device_pipeline_step,
    make_mesh,
    shard_scan_recon,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_make_mesh_shapes(eight_devices):
    m = make_mesh(devices=eight_devices)
    assert m.devices.shape == (1, 8)
    m = make_mesh({"batch": 2, "frame": 4}, devices=eight_devices)
    assert m.axis_names == ("batch", "frame")
    with pytest.raises(ValueError):
        make_mesh({"batch": 3, "frame": 3}, devices=eight_devices)


def test_frame_sharded_recon_matches_single_device(eight_devices, rng):
    F, ih, iw, S = 64, 32, 24, 3
    frames = rng.integers(0, 65536, size=(F, ih, iw), dtype=np.uint16)
    curve = 10.0 + 0.03 * np.arange(ih)
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    ind_l, left_w = build_shift_indices(floor, frac, [0, 2, -1], iw)
    mesh = make_mesh(devices=eight_devices)
    out_sharded = np.asarray(shard_scan_recon(frames, ind_l, left_w, mesh))
    out_single = np.asarray(reconstruct(frames, floor, frac, [0, 2, -1], kernel="onehot"))
    # sharded partial sums reorder f32 additions: +/-1 LSB at truncation edges
    np.testing.assert_allclose(
        out_sharded.astype(int), out_single.astype(int), atol=1
    )


def test_batched_pipeline_step_sharded(eight_devices, rng):
    mesh = make_mesh({"batch": 2, "frame": 4}, devices=eight_devices)
    B, F, ih, iw, S = 2, 16, 32, 16, 2
    frames = rng.integers(0, 65536, size=(B, F, ih, iw), dtype=np.uint16)
    curve = iw / 2 + 0.01 * np.arange(ih)
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    ind_l, left_w = build_shift_indices(floor, frac, [0, 1], iw)
    ind_l = np.broadcast_to(ind_l, (B,) + ind_l.shape)
    left_w = np.broadcast_to(left_w, (B,) + left_w.shape)
    mats = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    gains = np.ones((B, ih), dtype=np.float32)
    out = device_pipeline_step(frames, ind_l, left_w, mats, gains, mesh=mesh)
    assert out["raw"].shape == (B, S, ih, F)
    # identity warp + unit gain: circular == raw (up to the /65536*65536 trip)
    np.testing.assert_allclose(
        np.asarray(out["circular"][:, :, 1:-1, 1:-1], dtype=int),
        np.asarray(out["raw"][:, :, 1:-1, 1:-1], dtype=int),
        atol=1,
    )
    # mean matches direct computation
    ref_mean = (frames.astype(np.uint64).sum(1) // F).astype(np.uint16)
    np.testing.assert_array_equal(np.asarray(out["mean"]), ref_mean)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    mean, mx, disks = out
    assert disks.shape[0] == args[1].shape[0]


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_assign_files_partition():
    from solex_ser_recon_en_tpu.parallel.distributed import assign_files

    files = [f"scan_{i:03d}.ser" for i in range(50)]
    parts = [assign_files(files, 4, p) for p in range(4)]
    # complete, disjoint partition
    joined = sorted(sum(parts, []))
    assert joined == sorted(files)
    # reasonably balanced
    sizes = [len(p) for p in parts]
    assert min(sizes) >= 5
    # order-insensitive membership
    import random

    shuffled = files[:]
    random.Random(0).shuffle(shuffled)
    assert sorted(assign_files(shuffled, 4, 2)) == sorted(parts[2])
    with pytest.raises(ValueError):
        assign_files(files, 4, 7)
