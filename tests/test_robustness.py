"""Failure-handling tests (SURVEY.md §5.3 equivalents)."""

import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.io.ser import write_ser
from solex_ser_recon_en_tpu.pipeline.run import process_file


def test_ellipse_fit_failure_degrades_gracefully(tmp_path):
    """A scan with no disk (flat noise) can't be ellipse-fitted; the
    pipeline must still produce products via the backup-bounds path."""
    rng = np.random.default_rng(0)
    # bright frames with an absorption line but no disk envelope: the flood
    # threshold finds no blob worth fitting
    x = np.arange(64, dtype=np.float64)
    prof = 1 - 0.7 * np.exp(-0.5 * ((x - 32) / 2.5) ** 2)
    frames = (
        (28000 * prof[None, None, :] + rng.normal(0, 150, (80, 128, 64)))
        .clip(0, 65535)
        .astype(np.uint16)
    )
    p = str(tmp_path / "flat.ser")
    write_ser(p, frames)
    opts = Options(shift=[0], clahe_only=True, output_dir=str(tmp_path))
    results = process_file(p, opts)
    assert len(results) == 1
    assert os.path.exists(str(tmp_path / "flat_shift=0_clahe.png"))
    log = open(str(tmp_path / "flat_log.txt")).read()
    # either the fit failed and we degraded, or it "succeeded" on noise —
    # in both cases the run completes; a failure must be logged when it happens
    assert "end time" in log


def test_ellipse_failure_still_produces_requested_fit_shift(tmp_path):
    """When the requested shift coincides with the ellipse-fit shift and the
    fit fails, its products must still be written (identity geometry)."""
    rng = np.random.default_rng(1)
    x = np.arange(64, dtype=np.float64)
    prof = 1 - 0.7 * np.exp(-0.5 * ((x - 32) / 2.5) ** 2)
    frames = (
        (28000 * prof[None, None, :] + rng.normal(0, 150, (80, 128, 64)))
        .clip(0, 65535)
        .astype(np.uint16)
    )
    p = str(tmp_path / "flat2.ser")
    write_ser(p, frames)
    opts = Options(shift=[10], clahe_only=True, output_dir=str(tmp_path))
    results = process_file(p, opts)
    assert [s for s, _ in results] == [10]
    assert os.path.exists(str(tmp_path / "flat2_shift=10_clahe.png"))


def test_ellipse_fit_exception_forces_degrade_path(basic_scan, tmp_path, monkeypatch):
    """Force ellipse_to_circle to RAISE (not merely fit noise) and assert the
    documented identity-geometry degrade path completes with products —
    regression for the post-except fallthrough that read the unbound `geo`."""
    import solex_ser_recon_en_tpu.pipeline.run as runmod
    from solex_ser_recon_en_tpu.config import Options

    def boom(*a, **k):
        raise ValueError("forced ellipse failure")

    monkeypatch.setattr(runmod, "ellipse_to_circle", boom)
    outdir = tmp_path / "out"
    outdir.mkdir()
    opts = Options(shift=[0, 10], transversalium=True,
                   output_dir=str(outdir), _nolog=True)
    results = runmod.process_file(basic_scan["path"], opts)
    # both requested shifts (incl. the one sharing the ellipse-fit index)
    # still yield products under identity geometry
    assert sorted(s for s, _ in results) == [0, 10]
    assert opts.ratio_fixe == 1.0 and opts.slant_fix == 0.0


def test_feed_rate_monitor_policy():
    """Watchdog fires only after the sample window, only under the rate
    floor, and only with substantial work remaining."""
    import pytest

    from solex_ser_recon_en_tpu.io.feeder import FeedCollapse, FeedRateMonitor

    t = [0.0]
    clock = lambda: t[0]
    MB = 1024 * 1024

    # healthy link: 100 MB/s sustained, never fires
    m = FeedRateMonitor(4096 * MB, min_rate=30e6, min_sample_bytes=256 * MB,
                        min_remaining_bytes=512 * MB, clock=clock)
    for _ in range(40):
        m.note(100 * MB)
        t[0] += 1.0

    # collapsed link: 5 MB/s, fires once past the sample window
    m = FeedRateMonitor(4096 * MB, min_rate=30e6, min_sample_bytes=256 * MB,
                        min_remaining_bytes=512 * MB, clock=clock)
    m.note(100 * MB)  # first note starts the clock
    with pytest.raises(FeedCollapse):
        for _ in range(10):
            m.note(100 * MB)
            t[0] += 20.0  # 5 MB/s

    # collapsed but the scan is small enough that remaining work never
    # clears the guard: restarting wouldn't pay (10 MB/s sits between the
    # fast-tier floor 7.5 MB/s and the main floor 30 MB/s)
    m = FeedRateMonitor(700 * MB, min_rate=30e6, min_sample_bytes=256 * MB,
                        min_remaining_bytes=512 * MB, clock=clock)
    for _ in range(7):
        m.note(100 * MB)
        t[0] += 10.0

    # abysmal link (below a quarter of the floor): fires after only a
    # quarter of the sample window
    m = FeedRateMonitor(4096 * MB, min_rate=30e6, min_sample_bytes=256 * MB,
                        min_remaining_bytes=512 * MB, clock=clock)
    m.note(32 * MB)  # starts the clock
    with pytest.raises(FeedCollapse):
        for i in range(20):
            m.note(32 * MB)
            t[0] += 32.0  # 1 MB/s
    assert m._bytes <= 96 * MB  # well before the full 256 MB window


def test_feed_rate_monitor_scales_to_small_scans():
    """Small scans skip the probe, so the watchdog is their only trickle
    defence: the DEFAULT sample window / remaining guard scale to the
    scan (a 52 MB scan must collapse after ~2 trickled chunks, not ride
    the link for the whole transfer), while explicit caller values stay
    honoured and big scans keep the fixed 192/384 MB windows."""
    import pytest

    from solex_ser_recon_en_tpu.io.feeder import FeedCollapse, FeedRateMonitor

    t = [0.0]
    clock = lambda: t[0]
    MB = 1024 * 1024

    # 52 MB scan, ~8.7 MB chunks (the pipeline's small-scan 1/6 chunking),
    # 0.2 MB/s trickle: quarter tier (window/4 = 3.25 MB at floor/4
    # = 37.5 MB/s) fires on the second counted chunk
    m = FeedRateMonitor(52 * MB, clock=clock)
    assert m._min_sample == 13 * MB and m._min_remaining == 13 * MB
    m.note(8 * MB)  # starts the clock
    with pytest.raises(FeedCollapse):
        for _ in range(6):
            m.note(8 * MB)
            t[0] += 40.0  # 0.2 MB/s
    assert m._bytes <= 16 * MB  # caught after two counted chunks

    # healthy small-scan feed never fires
    m = FeedRateMonitor(52 * MB, clock=clock)
    for _ in range(7):
        m.note(8 * MB)
        t[0] += 0.03  # ~266 MB/s

    # tiny scans floor at 4/8 MB; big scans keep the fixed defaults
    m = FeedRateMonitor(6 * MB, clock=clock)
    assert m._min_sample == 4 * MB and m._min_remaining == 8 * MB
    m = FeedRateMonitor(4096 * MB, clock=clock)
    assert m._min_sample == 192 * MB and m._min_remaining == 384 * MB


def test_feed_collapse_falls_back_to_host(basic_scan, tmp_path, monkeypatch):
    """A mid-scan device-feed collapse restarts pass A on the host path and
    the scan still completes with identical disks."""
    import solex_ser_recon_en_tpu.io.feeder as feeder
    from solex_ser_recon_en_tpu.io.feeder import FeedCollapse
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    class Tripwire:
        def __init__(self, total_bytes, **kw):
            self.n = 0

        def note_chunk(self, chunk):
            self.n += 1
            if self.n >= 2:
                raise FeedCollapse("synthetic collapse")

    def run(name):
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="device",
                       frame_chunk=32)
        return np.asarray(read_scan(basic_scan["path"], opts).disk_list)

    d_device = run("normal")
    monkeypatch.setattr(feeder, "FeedRateMonitor", Tripwire)
    d_fallback = run("collapsed")
    # host float64 recon vs device one-hot matmul: 1-LSB tolerance
    diff = np.abs(d_device.astype(int) - d_fallback.astype(int))
    assert diff.max() <= 1


def test_note_collapse_poisons_probe_cache():
    """A measured collapse becomes the cached probe reading, steering
    subsequent feed decisions in this process to the host path."""
    import solex_ser_recon_en_tpu.io.feeder as feeder

    saved = feeder._PROBE_CACHE
    try:
        feeder.note_collapse(5e6)
        assert feeder.cached_probe_rate() == 5e6
        feeder.note_collapse(None)  # no measurement: keeps prior evidence
        assert feeder.cached_probe_rate() == 5e6
    finally:
        feeder._PROBE_CACHE = saved


def test_d2h_canary_detects_stalled_downlink(monkeypatch):
    """A readback that never completes flips d2h_responsive to False
    (abandoning the sample, not hanging), and the verdict is memoised."""
    import threading
    import types

    import solex_ser_recon_en_tpu.io.feeder as feeder

    saved = feeder._D2H_CACHE
    try:
        feeder._D2H_CACHE = None

        class StallPut:
            def device_put(self, *a, **kw):
                threading.Event().wait(30.0)  # simulated dead downlink

        monkeypatch.setattr(feeder, "jax", StallPut())
        assert feeder.d2h_responsive(timeout_s=0.2) is False
        # memoised: a second ask answers instantly without re-sampling
        monkeypatch.setattr(
            feeder, "jax",
            types.SimpleNamespace(device_put=lambda *a: (_ for _ in ()).throw(
                AssertionError("re-sampled"))),
        )
        assert feeder.d2h_responsive(timeout_s=0.2) is False
    finally:
        feeder._D2H_CACHE = saved


def test_dead_downlink_routes_feed_to_host(basic_scan, tmp_path, monkeypatch,
                                           capsys):
    """feed_mode=auto with an unresponsive device->host readback takes the
    host path up front (observed weather: 311 MB/s uploads while a 0.25 MB
    readback hung for minutes — the H2D probe alone cannot see it) and the
    scan still completes with identical disks."""
    import jax

    import solex_ser_recon_en_tpu.io.feeder as feeder
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    # the CPU-only fast path would route auto->host before the canary is
    # even consulted; pretend an accelerator backend so the d2h decision
    # under test is reached
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def run(name):
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="auto",
                       frame_chunk=32)
        return np.asarray(read_scan(basic_scan["path"], opts).disk_list)

    monkeypatch.setattr(feeder, "d2h_responsive", lambda *a, **kw: True)
    d_live = run("live")
    monkeypatch.setattr(feeder, "d2h_responsive", lambda *a, **kw: False)
    d_dead = run("dead")
    assert "readback unresponsive" in capsys.readouterr().out
    diff = np.abs(d_live.astype(int) - d_dead.astype(int))
    assert diff.max() <= 1


def test_edge_spectral_line_clips_like_reference(tmp_path):
    """A line sitting at the spectral-window edge: gather indices clip to
    [0, iw-2] (solex_util.py:117-118) and the pipeline completes for
    shifts that push outside the window."""
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    p = str(tmp_path / "edge.ser")
    SyntheticScan(ih=128, iw=48, frames=80, depth=16,
                  line_poly=(2.5, 0.01, 0.0, 0.0),  # near column 0
                  noise=0.003, seed=5).write(p, transpose_to_wide=True)
    opts = Options(shift=[-10, 0, 40], clahe_only=True, _nolog=True,
                   ratio_fixe=1.0, slant_fix=0.0, output_dir=str(tmp_path))
    results = process_file(p, opts)
    assert sorted(s for s, _ in results) == [-10, 0, 40]
    # clipped shifts degenerate to edge columns, never crash or wrap
    for _, (cc, _) in results:
        assert np.asarray(cc).shape[0] > 0


def test_tiny_scan_few_frames(tmp_path):
    """A handful of frames still produces products (the disk is a sliver;
    the ellipse fit degrades, the backup-bounds path completes)."""
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    p = str(tmp_path / "tiny.ser")
    SyntheticScan(ih=96, iw=48, frames=5, depth=16,
                  line_poly=(24.0, 0.0, 0.0, 0.0),
                  noise=0.003, seed=6).write(p, transpose_to_wide=True)
    opts = Options(shift=[0], clahe_only=True, _nolog=True,
                   output_dir=str(tmp_path))
    results = process_file(p, opts)
    assert len(results) == 1


def test_band_feed_collapse_falls_back_to_host_recon(basic_scan, tmp_path,
                                                     monkeypatch):
    """A collapse during the band transfer aborts the device recon and the
    host float64 recon produces the disks instead."""
    import solex_ser_recon_en_tpu.io.feeder as feeder
    from solex_ser_recon_en_tpu.io.feeder import FeedCollapse
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    def run(name):
        outdir = tmp_path / name
        outdir.mkdir()
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(outdir), feed_mode="band",
                       frame_chunk=16)
        return np.asarray(read_scan(basic_scan["path"], opts).disk_list)

    d_band = run("normal")

    class Tripwire:
        def __init__(self, total_bytes, **kw):
            self.n = 0

        def note_chunk(self, chunk):
            self.n += 1
            if self.n >= 2:
                raise FeedCollapse("synthetic band collapse")

    monkeypatch.setattr(feeder, "FeedRateMonitor", Tripwire)
    d_fallback = run("collapsed")
    diff = np.abs(d_band.astype(int) - d_fallback.astype(int))
    assert diff.max() <= 1


def test_malformed_ser_rejected_cleanly(tmp_path):
    """Corrupt headers fail at open with a clear ValueError (so the
    folder/batch precheck skips the file) rather than crashing deep in
    the pipeline.  reference: SHG_MAIN.py:104-129 per-file validation."""
    import struct

    from solex_ser_recon_en_tpu.io.ser import SerReader

    def mkhdr(width, height, depth, count):
        h = bytearray(178)
        h[0:14] = b"LUCAM-RECORDER"
        struct.pack_into("<I", h, 26, width)
        struct.pack_into("<I", h, 30, height)
        struct.pack_into("<I", h, 34, depth)
        struct.pack_into("<I", h, 38, count)
        return bytes(h)

    cases = {
        "garbage.ser": np.random.default_rng(0).integers(
            0, 256, 400, dtype=np.uint8
        ).tobytes(),
        "huge_dims.ser": mkhdr(10**9, 10**9, 16, 100),
        "zero_frames.ser": mkhdr(64, 32, 16, 0),
        "empty.ser": b"",
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises(ValueError):
            SerReader(str(p))


def test_eight_bit_ser_end_to_end(tmp_path):
    """An 8-bit SER runs the whole pipeline (x256 upscale path,
    video_reader.py:121-122) and yields a sane CLAHE product."""
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io import read_image
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.pipeline.run import process_file

    path = str(tmp_path / "eight.ser")
    SyntheticScan(
        ih=128, iw=48, frames=100, depth=8,
        line_poly=(24.0, 0.01, -1e-5, 0.0), noise=0.002, seed=5,
    ).write(path, transpose_to_wide=True)
    results = process_file(
        path, Options(shift=[0], clahe_only=True, output_dir=str(tmp_path))
    )
    assert len(results) == 1
    img = read_image(str(tmp_path / "eight_shift=0_clahe.png"))
    assert img.shape[0] == 128  # warp adjusts width to the fitted geometry
    assert img.dtype == np.uint16
    assert img.max() > 1000  # upscale + stretch reached 16-bit range


def test_canary_reheal_readopts_device_mid_batch(tmp_path, monkeypatch):
    """A folder batch started under a stalled D2H canary must re-adopt the
    accelerator feed when the canary heals mid-batch (the canary verdict is
    consulted per FILE, with a TTL'd cache underneath — VERDICT r3 item 8).
    """
    import numpy as np

    import solex_ser_recon_en_tpu.pipeline.run as run_mod
    from solex_ser_recon_en_tpu.config import Options
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.pipeline.run import read_scan

    scan = SyntheticScan(ih=96, iw=64, frames=40, depth=16,
                         line_poly=(32.0, 0.0, 0.0, 0.0), noise=0.002, seed=3)
    files = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.ser")
        scan.write(p, transpose_to_wide=True)
        files.append(p)

    # make the run look accelerator-attached so the canary branch decides
    # the feed (the tests' CPU backend otherwise short-circuits to host)
    import jax

    monkeypatch.setattr(run_mod.jax if hasattr(run_mod, "jax") else jax,
                        "default_backend", lambda: "tpu", raising=False)
    # the pipeline imports jax inside read_scan; patch the global one
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    import solex_ser_recon_en_tpu.io.feeder as feeder

    verdicts = iter([False, False, True])  # heals before the third file
    seen = []

    def fake_d2h(timeout_s: float = 5.0, min_bps: float = None) -> bool:
        v = next(verdicts, True)
        seen.append(v)
        return v

    monkeypatch.setattr(feeder, "d2h_responsive", fake_d2h)

    results = []
    for f in files:
        opts = Options(shift=[0], _nolog=True, ratio_fixe=1.0, slant_fix=0.0,
                       output_dir=str(tmp_path), feed_mode="auto")
        s = read_scan(f, opts)
        results.append(s)
    # first two files: stalled canary -> host pipeline; third: device feed
    assert results[0].host_pipeline and results[1].host_pipeline
    assert not results[2].host_pipeline, (
        "healed canary must re-adopt the device feed mid-batch")
    # and the disks agree regardless of path (1 LSB recon tolerance)
    a = np.asarray(results[0].disk_list[0] if isinstance(
        results[0].disk_list, list) else results[0].disk_list[0])
    b = np.asarray(results[2].disk_list[0] if isinstance(
        results[2].disk_list, list) else results[2].disk_list[0])
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_d2h_canary_stale_cache_serves_without_blocking(monkeypatch):
    """After the first measurement, a TTL expiry must serve the stale
    verdict immediately (kicking one background re-probe) instead of
    blocking a timed pipeline stage for the probe timeout — a dead-link
    batch was observed recording a 0.28 s scan as 5.4 s because it drew
    the blocking re-probe."""
    import time

    import solex_ser_recon_en_tpu.io.feeder as feeder

    saved = feeder._D2H_CACHE
    try:
        # a stale dead verdict from long ago
        feeder._D2H_CACHE = (0.0, time.monotonic() - 10 * feeder._D2H_TTL_S)
        calls = []

        def slow_measure(timeout_s):
            calls.append(timeout_s)
            time.sleep(0.2)
            return 1e9  # the link healed

        monkeypatch.setattr(feeder, "_d2h_measure", slow_measure)
        t0 = time.perf_counter()
        assert feeder.d2h_responsive(timeout_s=5.0) is False  # stale serve
        assert time.perf_counter() - t0 < 0.05, "stale serve must not block"
        # the background refresh lands and the healed verdict is re-adopted
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            if feeder._D2H_CACHE[0] > 0:
                break
            time.sleep(0.01)
        assert feeder.d2h_responsive(timeout_s=5.0) is True
        assert len(calls) == 1, "exactly one background re-probe"
    finally:
        feeder._D2H_CACHE = saved
