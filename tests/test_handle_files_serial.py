"""handle_files inline fast path: 1-core hosts process host-pipelined scans
inline, but NEVER concurrently with a pooled (device-feed) scan — the global
writer pool's end-of-scan barrier would drain the other scan's writes."""

import threading

import pytest

import importlib

# the cli package re-exports a `main` FUNCTION, which shadows the module on
# attribute-style imports — fetch the module object explicitly
M = importlib.import_module("solex_ser_recon_en_tpu.cli.main")


class _FakeScan:
    def __init__(self, host: bool):
        self.host_pipeline = host
        self.small_ops_host = host


def test_inline_never_overlaps_pooled_scan(tmp_path, monkeypatch):
    files = [str(tmp_path / f"s{i}.ser") for i in range(3)]
    for f in files:
        open(f, "wb").write(b"x")

    # file order: pooled (device), inline (host), pooled (device)
    flags = {files[0]: False, files[1]: True, files[2]: False}
    monkeypatch.setattr(M, "read_scan",
                        lambda f, o, t=None: _FakeScan(flags[f]))
    monkeypatch.setattr(
        "solex_ser_recon_en_tpu.pipeline.batch.read_scans_batched",
        lambda tasks, timers: {})

    active = []
    overlap = []
    order = []
    lock = threading.Lock()

    def fake_process(scan, opts, timer=None):
        with lock:
            if active:
                overlap.append(scan)
            active.append(scan)
        order.append(scan.host_pipeline)
        import time

        time.sleep(0.05)
        with lock:
            active.remove(scan)

    monkeypatch.setattr(M, "process_scan", fake_process)
    # force the 1-core gate regardless of the test machine
    monkeypatch.setattr(M.os, "sched_getaffinity", lambda pid: {0},
                        raising=False)

    from solex_ser_recon_en_tpu.config import Options

    done = M.handle_files(files, Options(output_dir=str(tmp_path)))
    assert done == 3
    assert not overlap, "inline host scan ran concurrently with pooled scan"
    # the host scan must come after the first pooled scan fully drained
    assert order == [False, True, False]
