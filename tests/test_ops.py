"""Device-op golden tests against cv2/numpy reference semantics."""

import cv2
import numpy as np
import pytest

from solex_ser_recon_en_tpu.ops import (
    mean_max,
    MeanMaxAccumulator,
    box_blur_u16,
    reconstruct,
    rescale_brightness,
    percentile,
)


def test_mean_max_matches_reference_semantics(rng):
    frames = rng.integers(0, 65536, size=(37, 24, 16), dtype=np.uint16)
    mean, mx = mean_max(frames)
    # reference: uint64 sum, / FrameCount, astype uint16 (solex_util.py:182-188)
    ref_mean = (frames.astype(np.uint64).sum(0) / 37).astype(np.uint16)
    np.testing.assert_array_equal(mean, ref_mean)
    np.testing.assert_array_equal(mx, frames.max(0))


def test_mean_max_streaming_matches_whole(rng):
    frames = rng.integers(0, 65536, size=(50, 12, 10), dtype=np.uint16)
    acc = MeanMaxAccumulator()
    for s in range(0, 50, 7):
        acc.update(frames[s : s + 7])
    mean_s, max_s = acc.result()
    mean_w, max_w = mean_max(frames)
    np.testing.assert_array_equal(mean_s, mean_w)
    np.testing.assert_array_equal(max_s, max_w)


@pytest.mark.parametrize("ksize", [(5, 5), (25, 3), (1, 7), (25, 1)])
def test_box_blur_matches_cv2(rng, ksize):
    img = rng.integers(0, 65536, size=(64, 48), dtype=np.uint16)
    ours = np.asarray(box_blur_u16(img, ksize[0], ksize[1]))
    ref = cv2.blur(img, ksize=ksize)
    # identical up to the round-half tie behaviour of the final division
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.03


def _recon_reference(frames, fit, shifts):
    """Faithful numpy replica of the reference hot loop.

    reference: solex_util.py:93-144 (read_video_improved)
    """
    F, ih, iw = frames.shape
    disks = [np.zeros((ih, F), dtype="uint16") for _ in shifts]
    cols = []
    for shift in shifts:
        ind_l = (np.asarray(fit)[:, 0] + np.ones(ih) * shift).astype(int)
        ind_l[ind_l < 0] = 0
        ind_l[ind_l > iw - 2] = iw - 2
        cols.append((ind_l, ind_l + 1))
    lw = np.ones(ih) - np.asarray(fit)[:, 1]
    rw = np.ones(ih) - lw
    for f in range(F):
        img = frames[f]
        for i in range(len(shifts)):
            ind_l, ind_r = cols[i]
            val = img[np.arange(ih), ind_l] * lw + img[np.arange(ih), ind_r] * rw
            disks[i][:, f] = val
    return disks


@pytest.mark.parametrize("kernel", ["gather", "onehot"])
def test_reconstruct_matches_reference(rng, kernel):
    F, ih, iw = 23, 40, 32
    frames = rng.integers(0, 65536, size=(F, ih, iw), dtype=np.uint16)
    y = np.arange(ih, dtype=np.float64)
    curve = 10.0 + 0.05 * y + 1e-3 * y * y
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    fit = np.stack([floor, frac, y, curve], axis=1)
    shifts = [-30, 0, 3, 10, 50]  # includes out-of-range clipping cases
    ref = _recon_reference(frames, fit, shifts)
    ours = np.asarray(reconstruct(frames, floor, frac, shifts, kernel=kernel))
    assert ours.shape == (len(shifts), ih, F)
    for i in range(len(shifts)):
        diff = np.abs(ours[i].astype(int) - ref[i].astype(int))
        assert diff.max() <= 1, f"shift {shifts[i]} max diff {diff.max()}"
        assert (diff > 0).mean() < 0.03


def test_rescale_brightness_matches_reference(rng):
    img = rng.integers(0, 65536, size=(20, 30), dtype=np.uint16)
    lo, hi = 1000.0, 50000.0
    ours = np.asarray(rescale_brightness(img, lo, hi))
    ref = (65535.0 * (img - lo) / (hi - lo)).clip(0, 65535).astype(np.uint16)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_rescale_brightness_validates():
    img = np.zeros((4, 4), dtype=np.uint16)
    with pytest.raises(ValueError):
        rescale_brightness(img, 100, 100)


def test_percentile_matches_numpy(rng):
    img = rng.integers(0, 65536, size=(50, 60), dtype=np.uint16)
    for q in (10.0, 99.9999):
        assert abs(percentile(img, q) - np.percentile(img, q)) < 2.0


def test_reconstruct_pallas_kernel(rng):
    """Pallas kernel agrees with the gather kernel (interpret mode on CPU)."""
    F, ih, iw = 19, 40, 32
    frames = rng.integers(0, 65536, size=(F, ih, iw), dtype=np.uint16)
    y = np.arange(ih, dtype=np.float64)
    curve = 10.0 + 0.05 * y
    floor = np.floor(curve).astype(np.int64)
    frac = curve - floor
    shifts = [-30, 0, 3]
    p = np.asarray(reconstruct(frames, floor, frac, shifts, kernel="pallas"))
    g = np.asarray(reconstruct(frames, floor, frac, shifts, kernel="gather"))
    assert np.abs(p.astype(int) - g.astype(int)).max() <= 1


def test_box_blur_exact_large_kernel(rng):
    """Window sums above 2^24 must not lose the last bit to an f32 cast."""
    img = rng.integers(0, 65536, size=(1200, 64), dtype=np.uint16)
    ours = np.asarray(box_blur_u16(img, 25, 40))
    import cv2

    ref = cv2.blur(img, ksize=(25, 40))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005  # only true half-ties remain (~1/k)


def test_mean_max_accumulator_oversized_chunk():
    """A single chunk longer than the int32 spill window stays exact."""
    from solex_ser_recon_en_tpu.ops.reduce import MeanMaxAccumulator

    n = (1 << 15) + 1000
    frames = np.full((n, 2, 3), 65535, dtype=np.uint16)
    acc = MeanMaxAccumulator()
    acc.update(frames)
    mean, mx = acc.result()
    assert mean.min() == 65535 and mx.max() == 65535
    assert acc.count == n


def test_box_blur_host_twin_bit_identical():
    """ops/blur numpy twins == device programs for integer inputs (the
    dispatch in geometry/linefit._blur_u16 and geometry/edges._blur relies
    on bit-identity)."""
    import jax.numpy as jnp
    import numpy as np

    from solex_ser_recon_en_tpu.ops.blur import (
        box_blur,
        box_blur_host,
        box_blur_u16,
        box_blur_u16_host,
    )

    rng = np.random.default_rng(9)
    for _ in range(8):
        h = int(rng.integers(8, 200))
        w = int(rng.integers(8, 200))
        img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        for kx, ky in [(5, 5), (25, 1), (25, 11), (1, 7), (3, 40)]:
            if kx >= w or ky >= h:
                continue
            dev = np.asarray(box_blur(jnp.asarray(img), kx, ky))
            host = box_blur_host(img, kx, ky)
            np.testing.assert_array_equal(dev, host, err_msg=f"{kx}x{ky}")
            dev16 = np.asarray(box_blur_u16(jnp.asarray(img), kx, ky))
            np.testing.assert_array_equal(
                dev16, box_blur_u16_host(img, kx, ky))
    # float inputs must refuse the host twin (cumsum order differs)
    import pytest

    with pytest.raises(TypeError):
        box_blur_host(np.ones((8, 8), np.float32), 3, 3)
