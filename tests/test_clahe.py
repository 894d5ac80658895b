"""CLAHE golden tests against OpenCV."""

import cv2
import numpy as np
import pytest

from solex_ser_recon_en_tpu.ops import clahe


@pytest.mark.parametrize("tiles", [(2, 2), (1, 1), (4, 4)])
@pytest.mark.parametrize("clip", [0.8, 2.0, 40.0])
def test_clahe_matches_cv2_uint8(rng, tiles, clip):
    img = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=tiles).apply(img)
    ours = np.asarray(clahe(img, clip_limit=clip, tiles=tiles))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_clahe_matches_cv2_uint16_reference_config(rng):
    """The exact product config: clipLimit=0.8, tiles (2,2), uint16.

    reference: solex_util.py:532-533
    """
    img = (rng.random((100, 90)) * 65535).astype(np.uint16)
    ref = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(img)
    ours = np.asarray(clahe(img, clip_limit=0.8, tiles=(2, 2)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_clahe_nondivisible_size(rng):
    """Image size not divisible by the tile grid exercises the reflect pad."""
    img = rng.integers(0, 65536, size=(101, 67), dtype=np.uint16)
    ref = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(img)
    ours = np.asarray(clahe(img, clip_limit=0.8, tiles=(2, 2)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_clahe_large_tile_grid_flat_gather(rng):
    """Tile grids past the packed-gather cutoff (T > 8) take the flat
    per-tap gather path; the standalone CLAHE tool exposes user-configured
    tile sizes, so a 16x16 grid must stay cheap AND cv2-accurate (the
    packed path would materialise an (h, w, 256) intermediate here)."""
    img = rng.integers(0, 256, size=(128, 160), dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(16, 16)).apply(img)
    ours = np.asarray(clahe(img, clip_limit=2.0, tiles=(16, 16)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_clahe_rejects_bad_dtype():
    with pytest.raises(TypeError):
        clahe(np.zeros((8, 8), dtype=np.float32))


def test_mxu_histogram_exact(rng):
    """The two-level one-hot MXU histogram (Pallas) is count-exact vs the
    sort-based path, including padding slots and both hist sizes."""
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.ops.clahe import (
        _tile_histograms_mxu,
        _tile_histograms_sort,
    )

    for hist_size, hi in ((65536, 65536), (256, 256)):
        tiles = rng.integers(0, hi, (3, 5000), dtype=np.int64).astype(np.int32)
        a = np.asarray(_tile_histograms_mxu(jnp.asarray(tiles), hist_size))
        b = np.asarray(_tile_histograms_sort(jnp.asarray(tiles), hist_size))
        np.testing.assert_array_equal(a, b)
        assert a.sum(axis=1).tolist() == [5000, 5000, 5000]


def test_percentile_from_hist(rng):
    """percentile_from_hist matches jnp.percentile for integer images to
    a few ULP of the final lerp (the order statistics are exact; the two
    paths round the mul+add chain differently) across sizes, values, and
    the q values the product stage uses."""
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.ops.clahe import (
        percentile_from_hist,
        value_histogram,
    )

    for n, hi in ((4096, 65536), (4355400, 65536), (999, 256), (37, 65536)):
        vals = rng.integers(0, hi, n, dtype=np.int64).astype(np.uint16)
        img = jnp.asarray(vals.reshape(1, -1))
        hist = value_histogram(img, 65536)
        for q in (99.9999, 10.0, 0.0, 100.0, 50.0, 33.3):
            ref = float(jnp.percentile(img.astype(jnp.float32).ravel(), q))
            got = float(percentile_from_hist(hist, n, q))
            ulp = float(np.spacing(np.float32(max(abs(ref), 1.0))))
            assert abs(ref - got) <= 8 * ulp, (n, q, ref, got, ulp)


def test_native_clahe_matches_cv2(rng):
    """native clahe_u16 (AVX-512 host kernel) is bit-identical to cv2 —
    including the joint-axis padding rule (cv2 pads BOTH axes by a full
    tile step when EITHER is non-divisible) and the fused output-value
    histogram the product stage consumes."""
    from solex_ser_recon_en_tpu.io.native import native_clahe_u16

    img0 = rng.integers(0, 65536, (128, 96), dtype=np.int64).astype(np.uint16)
    if native_clahe_u16(img0, 0.8, (2, 2)) is None:
        pytest.skip("native library unavailable")

    cases = [
        ((64, 64), (2, 2)), ((65, 63), (3, 3)), ((127, 129), (2, 3)),
        ((300, 451), (4, 4)), ((33, 9), (2, 2)), ((256, 256), (1, 1)),
    ]
    for (h, w), tiles in cases:
        for dist in ("uniform", "smooth", "zeros"):
            if dist == "uniform":
                img = rng.integers(0, 65536, (h, w), dtype=np.int64)
                img = img.astype(np.uint16)
            elif dist == "smooth":
                yy, xx = np.mgrid[0:h, 0:w]
                img = ((np.sin(yy / 7) + np.cos(xx / 11) + 2) * 16000)
                img = img.astype(np.uint16)
            else:
                img = np.zeros((h, w), np.uint16)
            ref = cv2.createCLAHE(clipLimit=0.8, tileGridSize=tiles).apply(img)
            out, hist = native_clahe_u16(img, 0.8, tiles, want_hist=True)
            np.testing.assert_array_equal(out, ref, err_msg=f"{h}x{w} {tiles} {dist}")
            np.testing.assert_array_equal(
                hist, np.bincount(out.ravel(), minlength=65536).astype(np.uint32)
            )
    # non-default clip limits (standalone tool range)
    for clip in (0.5, 1.0, 4.0, 40.0):
        img = rng.integers(0, 65536, (301, 517), dtype=np.int64).astype(np.uint16)
        ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(3, 2)).apply(img)
        out = native_clahe_u16(img, clip, (3, 2))
        np.testing.assert_array_equal(out, ref, err_msg=f"clip={clip}")
