"""Native SER I/O library tests (built from native/ser_io.cpp via ctypes)."""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.io.ser import write_ser
from solex_ser_recon_en_tpu.io.native import NativeSerReader, get_lib


pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


def test_native_reader_matches_python(tmp_path, rng):
    frames = rng.integers(0, 65536, size=(12, 20, 16), dtype=np.uint16)
    p = str(tmp_path / "n.ser")
    write_ser(p, frames)
    r = NativeSerReader(p)
    assert (r.Width, r.Height, r.pixel_depth, r.frame_count) == (16, 20, 16, 12)
    np.testing.assert_array_equal(r.read(0, 12), frames)
    np.testing.assert_array_equal(r.read(5, 3), frames[5:8])
    r.prefetch(0, 12)  # hint only; must not crash
    r.close()


def test_native_reader_clamps_truncated(tmp_path):
    frames = np.zeros((10, 8, 8), dtype=np.uint16)
    p = str(tmp_path / "t.ser")
    write_ser(p, frames)
    with open(p, "r+b") as f:
        f.truncate(178 + 10 * 8 * 8 * 2 - 100)
    r = NativeSerReader(p)
    assert r.frame_count == 9
    with pytest.raises(RuntimeError):
        r.read(0, 10)
    r.close()


def test_native_reader_bad_files(tmp_path):
    bad = tmp_path / "bad.ser"
    bad.write_bytes(b"short")
    with pytest.raises(RuntimeError):
        NativeSerReader(str(bad))
    with pytest.raises(RuntimeError):
        NativeSerReader(str(tmp_path / "missing.ser"))


def test_native_8bit(tmp_path, rng):
    frames = rng.integers(0, 256, size=(5, 6, 10), dtype=np.uint8)
    p = str(tmp_path / "e.ser")
    write_ser(p, frames)
    r = NativeSerReader(p)
    assert r.pixel_depth == 8
    np.testing.assert_array_equal(r.read(0, 5), frames)
    r.close()


@pytest.mark.parametrize("depth", [8, 16])
def test_native_mean_max_matches_numpy(tmp_path, rng, depth):
    dt = np.uint8 if depth == 8 else np.uint16
    hi = 256 if depth == 8 else 65536
    frames = rng.integers(0, hi, size=(37, 12, 20)).astype(dt)
    p = str(tmp_path / f"mm{depth}.ser")
    write_ser(p, frames)
    r = NativeSerReader(p)
    s, m = r.mean_max()
    r.close()
    np.testing.assert_array_equal(s, frames.sum(axis=0, dtype=np.uint64))
    np.testing.assert_array_equal(m, frames.max(axis=0).astype(np.uint16))


def test_host_mean_max_normalisation(tmp_path, rng):
    """host_mean_max (native or fallback) matches reference semantics:
    uint64 sum, truncating mean, rot90 for wide storage."""
    from solex_ser_recon_en_tpu.io.ser import SerReader
    from solex_ser_recon_en_tpu.io import hostreduce

    frames = rng.integers(0, 65536, size=(23, 10, 30), dtype=np.uint16)
    p = str(tmp_path / "hm.ser")
    write_ser(p, frames)  # wide storage -> exercises the rot90 path
    r = SerReader(p)
    mean, mx = hostreduce.host_mean_max(r)
    want_sum = np.rot90(frames.sum(axis=0, dtype=np.uint64))
    want_mean = (want_sum.astype(np.float64) / 23).astype(np.uint16)
    want_max = np.rot90(frames.max(axis=0))
    np.testing.assert_array_equal(mean, want_mean)
    np.testing.assert_array_equal(mx, want_max)


def test_stale_cached_so_never_shadows_new_source(tmp_path, monkeypatch):
    """Cached artifacts from older source (rsync'd, image layers, clock
    skew) must not shadow the current source: builds are keyed by source
    content, so get_lib always binds a library with the full ABI, and
    superseded artifacts are cleaned up."""
    import os
    import subprocess

    import solex_ser_recon_en_tpu.io.native as native

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    # stale .so exposing only the OLD symbols, under both legacy and
    # keyed-style names, with mtimes far in the future
    src = tmp_path / "old.cpp"
    src.write_text(
        'extern "C" {'
        "int ser_mean_max(void*, unsigned long long*, unsigned short*)"
        " { return -1; }"
        "}"
    )
    cache = tmp_path / "cache"
    cache.mkdir()
    stale = [cache / "libser_io.so", cache / "libser_io-deadbeef.so"]
    subprocess.run(
        ["g++", "-O0", "-shared", "-fPIC", "-o", str(stale[0]), str(src)],
        check=True, capture_output=True,
    )
    import shutil
    import time

    shutil.copy(stale[0], stale[1])
    # one artifact well past the cleanup grace period, one recent (a
    # concurrent process on an older checkout may be about to dlopen it —
    # recent artifacts must survive the sweep)
    old = time.time() - 30 * 24 * 3600
    os.utime(stale[0], (old, old))
    future = os.path.getmtime(os.path.abspath(native._SRC)) + 10**6
    os.utime(stale[1], (future, future))

    monkeypatch.setattr(native, "_CACHE", str(cache))
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    lib = native.get_lib()
    assert lib is not None
    assert hasattr(lib, "ser_mean_max_band")
    # superseded artifacts past the grace period were cleaned up; recent
    # ones were left alone, and neither shadowed the content-keyed build
    left = {p.name for p in cache.iterdir()}
    assert "libser_io.so" not in left
    assert "libser_io-deadbeef.so" in left


def test_native_warp_bit_identical_to_numpy_twin():
    """warp_body (native) must be BIT-identical to the numpy twin for both
    source dtypes, on a pipeline-shaped unit-y matrix AND a general
    projective one (the kernel mirrors the twin statement for statement
    with fp-contract off)."""
    from solex_ser_recon_en_tpu.io.native import native_warp_u16
    from solex_ser_recon_en_tpu.ops.warp import (
        warp_projective_host,
        warp_to_u16_host,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, size=(233, 211), dtype=np.uint16)
    mats = [
        np.array([[0.97, 0.08, -12.3], [0.0, 1.0, 4.7], [0.0, 0.0, 1.0]]),
        np.array([[1.02, -0.05, 8.0], [0.03, 0.98, -6.0],
                  [1e-5, -2e-5, 1.0]]),
    ]
    out_h, out_w = 240, 215
    cval = float(img[0, 0]) / 65536.0
    arr = img.astype(np.float32) / 65536.0
    for mat3 in mats:
        want = warp_to_u16_host(
            warp_projective_host(arr, mat3, out_h, out_w, cval)
        )
        got_f32 = native_warp_u16(arr, mat3, out_h, out_w, cval)
        got_u16 = native_warp_u16(img, mat3, out_h, out_w, cval)
        assert got_f32 is not None and got_u16 is not None
        np.testing.assert_array_equal(want, got_f32)
        np.testing.assert_array_equal(want, got_u16)


def test_warp_host_u16_fallback_matches(monkeypatch):
    """warp_host_u16 without the native library falls back to the numpy
    twin and returns the same bytes."""
    from solex_ser_recon_en_tpu.io import native
    from solex_ser_recon_en_tpu.ops import warp as warp_mod

    rng = np.random.default_rng(6)
    img = rng.integers(0, 65536, size=(64, 80), dtype=np.uint16)
    mat3 = np.array([[0.99, 0.02, -1.5], [0.0, 1.0, 0.8], [0.0, 0.0, 1.0]])
    with_native = warp_mod.warp_host_u16(img, mat3, 70, 85, 0.01)
    monkeypatch.setattr(native, "native_warp_u16",
                        lambda *a, **k: None)
    without = warp_mod.warp_host_u16(img, mat3, 70, 85, 0.01)
    np.testing.assert_array_equal(with_native, without)


def test_native_warp_batch_bit_identical_to_per_image():
    """The batched warp (one shared matrix, per-row coordinate reuse) must
    reproduce K independent native warps bit-for-bit — including
    out-of-bounds taps taking each image's own cval."""
    from solex_ser_recon_en_tpu.io.native import (
        get_lib,
        native_warp_u16,
        native_warp_u16_batch,
    )

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    k, h, w = 4, 90, 110
    imgs = [rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
            for _ in range(k)]
    mat3 = np.array([[0.97, 0.04, -2.5], [0.0, 1.0, 1.2],
                     [0.0, 0.0, 1.0]])
    out_h, out_w = 96, 118  # bigger than the source: forces cval taps
    cvals = [float(im[0, 0]) / 65536.0 for im in imgs]
    batch = np.empty((k, out_h, out_w), np.uint16)
    ok = native_warp_u16_batch(imgs, mat3, out_h, out_w, cvals, batch)
    assert ok
    for i in range(k):
        single = native_warp_u16(imgs[i], mat3, out_h, out_w, cvals[i])
        np.testing.assert_array_equal(batch[i], single)


def test_native_box_blur_bit_identical_to_numpy_twin():
    """box_blur_u16_exact (C) vs the pure-numpy window-sum twin: both are
    exact int32 sums + the same f32 quotient split, so every kernel/shape
    must agree BIT-for-bit; pads that would need multi-bounce reflection
    must return None (numpy fallback handles them)."""
    from solex_ser_recon_en_tpu.io.native import get_lib, native_box_blur_u16
    from solex_ser_recon_en_tpu.ops import blur as B

    if get_lib() is None or not hasattr(get_lib(), "box_blur_u16_exact"):
        pytest.skip("native library unavailable")

    def np_f32(img, kx, ky):
        s = B._window_sum_1d_host(img, ky, 0, np.int32)
        s = B._window_sum_1d_host(s, kx, 1, np.int32)
        k = kx * ky
        q = s // k
        r = s - q * k
        return q.astype(np.float32) + r.astype(np.float32) / np.float32(k)

    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(120):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        kx = int(rng.integers(1, 28))
        ky = int(rng.integers(1, 28))
        img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
        nf = native_box_blur_u16(img, kx, ky, "f32")
        nu = native_box_blur_u16(img, kx, ky, "u16")
        fits = (kx // 2 <= w - 1 and (kx - 1 - kx // 2) <= w - 1
                and ky // 2 <= h - 1 and (ky - 1 - ky // 2) <= h - 1)
        if not fits:
            assert nf is None and nu is None
            continue
        want_f = np_f32(img, kx, ky)
        np.testing.assert_array_equal(nf, want_f)
        np.testing.assert_array_equal(
            nu, np.clip(np.round(want_f), 0, 65535).astype(np.uint16))
        checked += 1
    assert checked > 40


def test_box_blur_host_dispatch_uses_native(monkeypatch):
    """The ops/blur host twins route 2-D u16 through the native kernel and
    still agree with the device program's semantics."""
    from solex_ser_recon_en_tpu.io.native import get_lib
    from solex_ser_recon_en_tpu.ops.blur import (
        box_blur_host, box_blur_u16, box_blur_u16_host,
    )

    if get_lib() is None:
        pytest.skip("native library unavailable")
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    img = rng.integers(0, 65536, (64, 48), dtype=np.uint16)
    np.testing.assert_array_equal(
        box_blur_u16_host(img, 5, 5),
        np.asarray(box_blur_u16(jnp.asarray(img), 5, 5)))
    out = box_blur_host(img, 25, 3)
    assert out.dtype == np.float32


def test_native_warp_batch_fuzz_bit_identical_to_numpy_twin():
    """Heavy fuzz for the vectorised batch warp (native/ser_io.cpp:
    warp_body_batch_u16_avx512 on AVX-512 hosts, the scalar body
    elsewhere): random sizes and projective matrices exercise the
    interior gather blocks, the border scalar lanes, row tails
    (out_w % 16 != 0), exact multiples of the lane width, and tiny
    sources — every plane must be BIT-identical to the numpy twin."""
    from solex_ser_recon_en_tpu.io.native import (
        get_lib,
        native_warp_u16_batch,
    )
    from solex_ser_recon_en_tpu.ops.warp import (
        warp_projective_host,
        warp_to_u16_host,
    )

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    # (h, w, out_h, out_w) shape cases: fully-interior zoom-in, pure
    # upsize (all-border), lane-width multiples, tiny, and random
    cases = [(64, 128, 32, 64), (40, 50, 80, 96), (33, 17, 21, 16),
             (2, 2, 3, 3), (200, 213, 190, 207)]
    for trial in range(8):
        cases.append(tuple(int(rng.integers(2, 240)) for _ in range(4)))
    for h, w, out_h, out_w in cases:
        k = int(rng.integers(1, 4))
        imgs = [rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
                for _ in range(k)]
        mat3 = np.eye(3)
        mat3[:2, :2] += rng.normal(0.0, 0.06, (2, 2))
        mat3[:2, 2] = rng.normal(0.0, 8.0, 2)
        mat3[2, :2] = rng.normal(0.0, 1e-4, 2)
        cvals = [float(rng.random()) for _ in range(k)]
        out = np.empty((k, out_h, out_w), np.uint16)
        assert native_warp_u16_batch(imgs, mat3, out_h, out_w, cvals, out)
        for i in range(k):
            arr = imgs[i].astype(np.float32) / 65536.0
            want = warp_to_u16_host(
                warp_projective_host(arr, mat3, out_h, out_w, cvals[i])
            )
            np.testing.assert_array_equal(out[i], want)
