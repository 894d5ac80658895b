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
