"""The cv2/numpy product core (CPU-only fast path) vs the XLA programs.

On a CPU-only backend the pipeline computes products with cv2 CLAHE +
np.percentile (the reference's own forms, solex_util.py:532-541) instead
of the MXU-shaped XLA program — ~5x faster where there is no MXU.  The
two paths must agree: CLAHE bit-exactly (both are cv2-exact), the
stretched products within 1 LSB (the device percentiles come from exact
histogram CDFs, the host ones from np.percentile — docs/PARITY.md #7).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from solex_ser_recon_en_tpu.pipeline import products  # noqa: E402


def _disk_image(rng, h=256, w=220):
    y, x = np.mgrid[0:h, 0:w]
    r = np.hypot(y - h / 2, x - w / 2)
    img = 28000.0 * np.clip(1.1 - r / (0.4 * min(h, w)), 0, 1)
    img += rng.normal(0, 120, (h, w))
    return np.clip(img, 0, 65535).astype(np.uint16)


def test_host_core_matches_device_core(monkeypatch):
    rng = np.random.default_rng(7)
    f = _disk_image(rng)
    dev = [np.asarray(o) for o in products._products_core(f)]
    host = list(products._products_body_host(f))
    names = ["clahe", "cc", "high_contrast", "protus"]
    for name, h_img, d_img in zip(names, host, dev):
        diff = np.abs(h_img.astype(np.int32) - d_img.astype(np.int32))
        # CLAHE: both within 1 LSB of cv2 -> <=2 apart; stretches scale a
        # 1-LSB threshold difference by the stretch slope (measured <=2)
        assert diff.max() <= 3, f"{name}: max diff {diff.max()}"


def test_host_gained_core_matches_device(monkeypatch):
    rng = np.random.default_rng(8)
    f = _disk_image(rng)
    gain = 1.0 + 0.05 * np.sin(np.arange(f.shape[0]) / 7.0)
    dev = [np.asarray(o) for o in
           products._products_core_gained(f, gain.astype(np.float32))]
    host = list(products._products_core_gained_host(f, gain))
    np.testing.assert_array_equal(host[0], dev[0], err_msg="detrans")
    for h_img, d_img in zip(host[1:], dev[1:]):
        diff = np.abs(h_img.astype(np.int32) - d_img.astype(np.int32))
        assert diff.max() <= 3


def test_pipeline_outputs_equal_under_host_products(monkeypatch, tmp_path,
                                                    basic_scan):
    """process_file with SOLEX_HOST_PRODUCTS on vs off: the written
    _clahe.png product must agree within a few LSB end-to-end."""
    import os

    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io import read_image
    from solex_ser_recon_en_tpu.pipeline.run import process_file

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SOLEX_HOST_PRODUCTS", mode)
        outdir = tmp_path / f"m{mode}"
        outdir.mkdir()
        process_file(basic_scan["path"],
                     Options(shift=[0], clahe_only=True,
                             output_dir=str(outdir)))
        png = next(f for f in os.listdir(outdir) if f.endswith("_clahe.png"))
        outs[mode] = np.asarray(read_image(str(outdir / png)), np.int32)
    diff = np.abs(outs["0"] - outs["1"])
    # the final product is STRETCHED: a 1-LSB CLAHE difference is
    # amplified by the stretch slope 65535/(bright-dark), which can be
    # ~100 on a low-contrast synthetic disk — so bound the bulk tightly
    # and the sparse amplified pixels by a generous slope allowance
    assert np.quantile(diff, 0.999) <= 3, f"bulk diff {np.quantile(diff, 0.999)}"
    assert diff.max() <= 300, f"max diff {diff.max()}"


def test_batched_host_products_match(monkeypatch):
    monkeypatch.setenv("SOLEX_HOST_PRODUCTS", "1")
    rng = np.random.default_rng(9)
    stack = np.stack([_disk_image(rng) for _ in range(3)])
    host = products.products_core_batched(stack)
    monkeypatch.setenv("SOLEX_HOST_PRODUCTS", "0")
    dev = products.products_core_batched(stack)
    for h_img, d_img in zip(host, dev):
        diff = np.abs(np.asarray(h_img, np.int64)
                      - np.asarray(d_img, np.int64))
        assert diff.max() <= 3


def test_host_warp_twin_matches_device():
    """The numpy warp twin (full-host mode) agrees with the device warp
    within 1 LSB after the u16 store (reduction-order rounding only)."""
    import numpy as np

    from solex_ser_recon_en_tpu.ops.warp import (
        warp_projective,
        warp_projective_host,
        warp_to_u16,
        warp_to_u16_host,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (120, 140)).astype(np.uint16)
    mat3 = np.array([[1.02, 0.03, -2.0], [0.0, 1.0, 1.5], [0, 0, 1.0]])
    f = img.astype(np.float32) / 65536.0
    dev = np.asarray(warp_to_u16(
        warp_projective(f, mat3, 130, 150, cval=float(f[0, 0]))
    ))
    host = warp_to_u16_host(
        warp_projective_host(f, mat3, 130, 150, cval=float(f[0, 0]))
    )
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_host_core_lut_forms_bit_exact_vs_straight_numpy():
    """The host core's value-LUT stretches and histogram percentiles must be
    BIT-identical to the straight numpy forms they replace (the reference's
    own calls: np.percentile + a float32 image stretch)."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        f = (
            _disk_image(rng)
            if trial % 2 == 0
            else rng.integers(0, 65536, size=(173, 211), dtype=np.uint16)
        )
        cl1 = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(f)
        bright = max(float(np.percentile(f, 99.9999)), 1.0)
        dark_clahe = float(np.percentile(cl1, 10.0))
        bright_clahe = max(float(cl1.max()), dark_clahe + 1.0)

        def stretch(img, lo, hi):
            x = 65535.0 * (img.astype(np.float32) - lo) / np.float32(hi - lo)
            return np.clip(x, 0, 65535).astype(np.uint16)

        want = (
            cl1,
            stretch(cl1, dark_clahe, bright_clahe),
            stretch(f, bright * 0.25, bright),
            stretch(f, 0.0, max(bright * 0.18, 1.0)),
        )
        got = products._products_body_host(f)
        for w_img, g_img in zip(want, got):
            np.testing.assert_array_equal(w_img, g_img)


def test_histogram_percentile_twin_fuzz():
    """_np_percentile_from_counts == float(np.percentile) for u16 data."""
    rng = np.random.default_rng(3)
    for _ in range(60):
        n = int(rng.integers(3, 20000))
        img = rng.integers(0, 65536, size=n, dtype=np.uint16)
        counts = np.bincount(img, minlength=65536)
        for q in (99.9999, 10.0, 0.1, 50.0, float(rng.uniform(0, 100))):
            assert products._np_percentile_from_counts(counts, n, q) == float(
                np.percentile(img, q)
            )


def test_want_gates_skip_unconsumed_products():
    """want=(hc, protus) skips exactly the unrequested stretch products and
    leaves the computed ones bit-identical to the full-want core."""
    rng = np.random.default_rng(9)
    f = _disk_image(rng)
    full = products._products_body_host(f)
    cl1, cc, hc, protus = products._products_body_host(f, (False, False))
    assert hc is None and protus is None
    np.testing.assert_array_equal(cl1, full[0])
    np.testing.assert_array_equal(cc, full[1])
    _, _, hc_only, protus_none = products._products_body_host(f, (True, False))
    assert protus_none is None
    np.testing.assert_array_equal(hc_only, full[2])
    _, _, hc_none, protus_only = products._products_body_host(f, (False, True))
    assert hc_none is None
    np.testing.assert_array_equal(protus_only, full[3])


def test_needed_products_gates_match_save_behaviour(tmp_path):
    """A clahe_only host-core run computes no protus/high-contrast (returns
    protus=None) yet writes the same _clahe.png as always."""
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.pipeline.products import (
        image_process,
        needed_products,
    )
    from solex_ser_recon_en_tpu.geometry.correct import NO_CIRCLE

    assert needed_products(Options(shift=[0], clahe_only=True)) == (False, False)
    assert needed_products(Options(shift=[0])) == (True, True)
    assert needed_products(Options(shift=[0], protus_only=True)) == (False, True)
    assert needed_products(Options(shift=[0], clahe_only=True),
                           save=False) == (False, True)

    rng = np.random.default_rng(10)
    f = _disk_image(rng)
    import os
    old = os.environ.get("SOLEX_HOST_PRODUCTS")
    os.environ["SOLEX_HOST_PRODUCTS"] = "1"
    try:
        opts = Options(shift=[0], clahe_only=True, output_dir=str(tmp_path))
        cc, protus = image_process(f, NO_CIRCLE, opts, basefich="lazy")
        assert protus is None
        full_opts = Options(shift=[0], output_dir=str(tmp_path))
        cc_full, protus_full = image_process(
            f, NO_CIRCLE, full_opts, basefich="full"
        )
        assert protus_full is not None
        np.testing.assert_array_equal(np.asarray(cc), np.asarray(cc_full))
    finally:
        if old is None:
            os.environ.pop("SOLEX_HOST_PRODUCTS", None)
        else:
            os.environ["SOLEX_HOST_PRODUCTS"] = old
    from solex_ser_recon_en_tpu.io.writers import barrier

    barrier()
    from solex_ser_recon_en_tpu.io import read_image

    a = read_image(str(tmp_path / "lazy_clahe.png"))
    b = read_image(str(tmp_path / "full_clahe.png"))
    np.testing.assert_array_equal(a, b)


def test_correct_transversalium_stays_host_side(monkeypatch):
    """Under the host product core, correct_transversalium must return a
    NUMPY array, not a device placement: on a dead-downlink relay the next
    stage's np.asarray (crop_width, pipeline/run.py) stalls minutes on the
    readback.  The host multiply must also be bit-identical to the device
    apply_row_gain program."""
    from solex_ser_recon_en_tpu.pipeline.transversalium import (
        correct_transversalium,
    )

    rng = np.random.default_rng(11)
    img = _disk_image(rng, h=128, w=110)
    circle = (55.0, 64.0, 48.0)  # (cx, cy, r)
    borders = [0, circle[1] - circle[2] + 6, img.shape[1] - 1,
               circle[1] + circle[2] - 6]

    monkeypatch.setenv("SOLEX_HOST_PRODUCTS", "1")
    out_h, c_h = correct_transversalium(img, circle, borders, 301)
    assert type(out_h) is np.ndarray, "host mode leaked a device array"
    assert c_h[int(circle[1])] != 1.0  # the correction actually did work

    # the host multiply is bit-identical to the device apply_row_gain
    # program given the same gain (the row-STATS paths differ by ~1e-8
    # f32 reduction order — covered by the stats equivalence tests)
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.ops.rowstats import apply_row_gain

    ref = np.asarray(
        apply_row_gain(jnp.asarray(img), jnp.asarray(c_h, dtype=np.float32))
    )
    np.testing.assert_array_equal(out_h, ref)
