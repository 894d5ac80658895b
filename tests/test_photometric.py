"""Transversalium / vignette / product-stage tests."""

import math
import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.pipeline import (
    correct_transversalium,
    tukey_taper,
    remove_vignette,
    image_process,
    crop_width,
)
from solex_ser_recon_en_tpu.pipeline.transversalium import fix_edge_effect


def _reference_taper(N, a=0.05):
    # reference solex_util.py:456-470
    def t(x):
        if 0 <= x < a * N / 2:
            return 1 / 2 * (1 - math.cos(2 * math.pi * x / (a * N)))
        elif a * N / 2 <= x <= N / 2:
            return 1
        elif N / 2 <= x <= N:
            return t(N - x)
        return 1

    return np.array([t(x) for x in range(N)])


@pytest.mark.parametrize("n", [40, 101, 400])
def test_tukey_taper_matches_reference(n):
    np.testing.assert_allclose(tukey_taper(n), _reference_taper(n), atol=1e-12)


def _striped_disk(h=300, w=280, stripe_amp=0.12, seed=0):
    """Synthetic circular disk with multiplicative row stripes."""
    rng = np.random.default_rng(seed)
    cy, cx, r = h / 2, w / 2, 110.0
    ys, xs = np.mgrid[:h, :w]
    rho2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / r**2
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    disk = np.where(rho2 < 1, 1 - 0.4 * (1 - mu), 0.01) * 45000
    gain = 1 + stripe_amp * np.sin(np.arange(h) / 2.1) * np.sin(0.3 + np.arange(h) / 5.7)
    img = np.clip(disk * gain[:, None] + rng.normal(0, 30, disk.shape), 1, 65535)
    return img.astype(np.uint16), (cx, cy, r), gain


def test_transversalium_removes_stripes():
    img, circle, gain = _striped_disk()
    # borders as the ellipse fit produces them: slightly inside the limb
    # (get_edge_list's 1.7% crop / the +20 backup margin, Solex_recon.py:146)
    borders = [0, circle[1] - circle[2] + 10, img.shape[1] - 1,
               circle[1] + circle[2] - 10]
    out, c = correct_transversalium(img, circle, borders, trans_strength=151)
    assert out.dtype == np.uint16
    # stripe energy inside the disk must drop substantially
    h, w = img.shape
    band = slice(int(circle[1] - 60), int(circle[1] + 60))
    cols = slice(int(circle[0] - 60), int(circle[0] + 60))

    def stripe_energy(a):
        rows = a[band, cols].astype(float).mean(axis=1)
        detr = rows - np.convolve(rows, np.ones(31) / 31, mode="same")
        return np.std(detr[15:-15])

    assert stripe_energy(out) < 0.35 * stripe_energy(img)
    # the recovered gain is anti-correlated with the injected striping
    yy = np.arange(int(circle[1] - 80), int(circle[1] + 80))
    corr = np.corrcoef(c[yy], 1 / gain[yy])[0, 1]
    assert corr > 0.7


def test_transversalium_stubborn_path_runs():
    img, circle, gain = _striped_disk(stripe_amp=0.3)
    borders = [0, 0, img.shape[1] - 1, img.shape[0] - 1]
    out, _ = correct_transversalium(
        img, circle, borders, trans_strength=151, stubborn=True
    )
    assert out.dtype == np.uint16
    assert out.shape == img.shape


def test_fix_edge_effect_matches_reference_loop():
    # direct replica of the reference loop (solex_util.py:357-375)
    def ref_fix(multiplier, circle, linlen):
        multiplier = multiplier.copy()
        y1 = math.ceil(max(circle[1] - circle[2], 0))
        y2 = math.floor(min(circle[1] + circle[2], multiplier.shape[0] - 1))
        halflen = linlen // 2
        multiplier[:y1, :] = 0
        multiplier[y2 + 1 :, :] = 0
        for y in range(y1, y2):
            dx = math.floor((circle[2] ** 2 - (y - circle[1]) ** 2) ** 0.5)
            x2 = math.floor(min(circle[0] + dx, multiplier.shape[1] - 1))
            x1 = math.ceil(max(circle[0] - dx, 0))
            multiplier[y, :x1] = 0
            multiplier[y, x2:] = 0
            if x2 - x1 < linlen:
                continue
            if x1 > 0:
                multiplier[y, x1 : x1 + halflen] = multiplier[y, x1 + halflen]
            if x2 < multiplier.shape[1] - 1:
                multiplier[y, x2 - halflen : x2] = multiplier[y, x2 - halflen - 1]
        return multiplier

    rng = np.random.default_rng(1)
    mult = rng.normal(size=(120, 140))
    circle = (70.0, 60.0, 60.0)  # clipped circle: exercises edge branches
    ours = fix_edge_effect(mult, circle, 41)
    ref = ref_fix(mult, circle, 41)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_remove_vignette_flattens_droop():
    img, circle, _ = _striped_disk(stripe_amp=0.0, h=400, w=380)
    droop = 1 - 0.3 * ((np.arange(400) - 200) / 200) ** 2
    vig = np.clip(img.astype(float) * droop[:, None], 1, 65535)
    out = remove_vignette(vig, circle)
    rows_in = vig[140:260, 150:230].mean(axis=1)
    rows_out = out[140:260, 150:230].mean(axis=1)
    assert np.std(rows_out) < np.std(rows_in)


def test_crop_width_fixed_and_square():
    img = np.arange(30 * 40, dtype=np.uint16).reshape(30, 40)
    circle = (22.0, 15.0, 10.0)
    opts = Options(fixed_width=20)
    out, c2 = crop_width(img, circle, opts)
    assert out.shape == (30, 20)
    assert c2[0] == 10  # recentred
    # disk column content preserved around the centre
    np.testing.assert_array_equal(out[:, 10], img[:, 22])
    opts = Options(crop_width_square=True)
    out, _ = crop_width(img, circle, opts)
    assert out.shape == (30, 30)
    # no-op without flags
    out, _ = crop_width(img, circle, Options())
    assert out.shape == img.shape


def test_image_process_writes_products(tmp_path):
    from solex_ser_recon_en_tpu.io.writers import barrier

    img, circle, _ = _striped_disk()
    opts = Options(save_fit=True)
    base = str(tmp_path / "scan_shift=0")
    cc, protus = image_process(img, circle, opts, header={"NAXIS1": 1}, basefich=base)
    barrier()  # image_process queues writes; pipeline callers join for us
    for suffix in ("_clahe.png", "_protus.png", "_uncontrasted.png",
                   "_high_contrast.png", "_clahe.fits"):
        assert os.path.exists(base + suffix), suffix
    # protus disc is painted (value 80 at centre)
    assert protus[int(circle[1]), int(circle[0])] == 80
    # clahe_only suppresses the protus png
    base2 = str(tmp_path / "b_shift=0")
    opts2 = Options(clahe_only=True)
    image_process(img, circle, opts2, basefich=base2)
    barrier()
    assert os.path.exists(base2 + "_clahe.png")
    assert not os.path.exists(base2 + "_protus.png")


def test_image_process_rotation():
    img, circle, _ = _striped_disk()
    opts = Options(img_rotate=90, _nolog=True)
    cc, protus = image_process(img, circle, opts, save=False)
    assert cc.shape == (img.shape[1], img.shape[0])


def test_products_core_odd_size_matches_percentile(rng):
    """Odd-sized images take the padding fallback (CLAHE's reflect padding
    taints the tile-histogram sum, so the product core computes a direct
    value histogram); the stretch scales must still equal the
    jnp.percentile-based reference math (solex_util.py:534-541)."""
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.pipeline.products import _products_core

    img = rng.integers(0, 60000, (129, 131), dtype=np.uint16)  # odd dims
    cl1, cc, hc, protus = [np.asarray(x) for x in _products_core(jnp.asarray(img))]

    f32 = jnp.asarray(img).astype(jnp.float32).ravel()
    bright = max(float(jnp.percentile(f32, 99.9999)), 1.0)
    hc_ref = np.clip(
        65535.0 * (img.astype(np.float32) - 0.25 * bright) / (0.75 * bright),
        0, 65535,
    ).astype(np.uint16)
    # scales agree to a few ULP -> at most 1 output level at boundaries
    diff = np.abs(hc.astype(np.int64) - hc_ref.astype(np.int64))
    assert diff.max() <= 1
    protus_ref = np.clip(
        65535.0 * img.astype(np.float32) / max(bright * 0.18, 1.0), 0, 65535
    ).astype(np.uint16)
    assert np.abs(protus.astype(np.int64) - protus_ref.astype(np.int64)).max() <= 1


def test_row_stats_band_crop_exact():
    """The host gain path computes row stats on the band's row slice only;
    the crop must reproduce the full-frame stats bit-for-bit over the
    consumed band (rows are independent: each row's medians and kept-sum
    see exactly the same entries in the same order)."""
    from solex_ser_recon_en_tpu.pipeline.transversalium import (
        _row_band,
        _row_stats_host,
        _strip_mask_host,
    )

    rng = np.random.default_rng(7)
    h, w = 300, 280
    img = rng.integers(50, 60000, (h, w)).astype(np.uint16)
    circle = (140.0, 150.0, 110.0)
    borders = [4.0, 30.0, 270.0, 280.0]

    full_valid = _strip_mask_host(h, w, circle, borders)
    full = _row_stats_host(img, full_valid)

    y1, y2 = _row_band(circle, borders)
    a, b = max(y1, 0), min(y2, h)
    valid = _strip_mask_host(h, w, circle, borders, row0=a, row1=b)
    np.testing.assert_array_equal(valid, full_valid[a:b])
    sub = _row_stats_host(np.asarray(img[a:b]), valid)
    np.testing.assert_array_equal(sub[1:], full[a + 1:b])


def test_native_row_medstats_bit_identical_fuzz():
    """The native median/MAD selection core (native/ser_io.cpp:
    row_medstats_f32) must be BIT-identical to the pure-numpy twin across
    radix fast path, non-finite fallback rows (log 0/0 NaNs, log(0) infs),
    and degenerate masks."""
    import numpy as np

    from solex_ser_recon_en_tpu.io.native import get_lib
    from solex_ser_recon_en_tpu.pipeline.transversalium import (
        _row_stats_host,
        _row_stats_host_fast,
        _strip_bounds_host,
        _strip_mask_host,
    )

    lib = get_lib()
    if lib is None or not hasattr(lib, "row_medstats_f32"):
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    for trial in range(25):
        R = int(rng.integers(3, 120))
        W = int(rng.integers(8, 300))
        img = (rng.uniform(0, 1.0, (R, W)) * 60000).astype(np.float32)
        if trial % 3 == 0:  # zero rows/cols -> NaN/inf log-ratios
            img[rng.integers(0, R, 4), :] = 0
            img[:, rng.integers(0, W, 4)] = 0
        if trial % 4 == 0:  # constant rows -> mdev == 0 keep-all branch
            img[rng.integers(0, R, 2), :] = 123
        cx, cy = rng.uniform(0, W), rng.uniform(0, R)
        r = rng.uniform(1, max(R, W))
        borders = [0, 0, W, R]
        row_ok, lo, hi = _strip_bounds_host(R, W, (cx, cy, r), borders)
        valid = _strip_mask_host(R, W, (cx, cy, r), borders)
        ref = _row_stats_host(img, valid)
        fast = _row_stats_host_fast(img, row_ok, lo, hi)
        np.testing.assert_array_equal(ref, fast, err_msg=f"trial {trial}")


def test_native_pixel_kernels_exact():
    """gain_hist/hist/lut kernels are value-exact vs the numpy forms."""
    import numpy as np

    from solex_ser_recon_en_tpu.io.native import (
        native_gain_hist_u16,
        native_hist_u16,
        native_lut_u16,
    )

    if native_hist_u16(np.zeros((2, 2), np.uint16)) is None:
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(5)
    for _ in range(10):
        H, W = int(rng.integers(2, 200)), int(rng.integers(2, 200))
        u = rng.integers(0, 65536, (H, W)).astype(np.uint16)
        g = rng.uniform(0.0, 2.5, H).astype(np.float32)
        out, hist = native_gain_hist_u16(u, g)
        ref = np.clip(u.astype(np.float32) * g[:, None], 0,
                      65535).astype(np.uint16)
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(
            hist.astype(np.int64), np.bincount(ref.ravel(), minlength=65536))
        np.testing.assert_array_equal(
            native_hist_u16(u).astype(np.int64),
            np.bincount(u.ravel(), minlength=65536))
        lut = rng.integers(0, 65536, 65536).astype(np.uint16)
        np.testing.assert_array_equal(native_lut_u16(u, lut), lut[u])
