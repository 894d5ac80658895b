"""The bench's compact final-stdout-line summary contract.

The driver records only the tail of ``bench.py`` stdout; round 4's
full-detail single line overflowed that capture and the round lost its
recorded headline (``parsed: null`` in BENCH_r04.json).  The fix is a
compact summary printed as the FINAL line — this test pins its shape so
a refactor can never silently fatten or drop it again.  Deliberately
jax-free: importing ``bench`` must not initialise any backend.
"""

import importlib.util
import json
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _result(**over):
    base = {
        "metric": "e2e_2000frame_16bit_full_disk_scan",
        "value": 0.25,
        "unit": "s",
        "vs_baseline": 30.0,
        "median_s": 0.27,
        "vs_baseline_median": 28.0,
        "warmup_s": 7.0,
        "cpu_reference_s": 7.5,
        "cpu_runs_s": [7.5, 8.1, 7.9],
        "cpu_reference_clean_s": 7.1,
        "e2e_runs_s": [0.26, 0.25, 0.3],
        "host_memcpy_gbps": [3.0, 2.5, 2.8],
        "stages_ms": {"mean/max": 90.0, "products": 55.0},
        "frames_per_s": 8000.0,
        "vs_reference_actual": 40.0,
        "extra_configs": {
            "config2": {"value": 0.5, "vs_baseline": 21.0,
                        "vs_reference_actual": 33.0,
                        "stages_ms": {"products": 140.0}},
            "config5": {"error": "boom"},
        },
        "device_only_frames_per_s": 85000.0,
        "device_attached": {"device_resident_e2e_s": 1.0,
                            "post_stages_ms": {"products": 400.0}},
    }
    base.update(over)
    return base


def test_no_jax_on_import():
    had_jax = "jax" in sys.modules
    _load_bench()
    assert ("jax" in sys.modules) == had_jax  # import must stay backend-free


def test_summary_carries_every_primary_figure():
    bench = _load_bench()
    s = bench.build_summary(_result(), ["/tmp/x/latest_full.json"])
    # the fields the judge/driver read, by name
    for key in ("metric", "value", "unit", "vs_baseline",
                "vs_baseline_median", "vs_reference_actual",
                "value_spread_s", "cpu_spread_s", "ratio_range",
                "frames_per_s", "device_only_frames_per_s",
                "device_resident_e2e_s", "configs", "detail_file"):
        assert key in s, key
    assert s["value"] == 0.25 and s["vs_baseline"] == 30.0
    assert s["value_spread_s"] == [0.25, 0.3]
    assert s["cpu_spread_s"] == [7.5, 8.1]
    # worst-vs-best through best-vs-worst pairing envelope
    assert s["ratio_range"] == [round(7.5 / 0.3, 2), round(8.1 / 0.25, 2)]
    # per-config scoreboard: dict configs flattened to the three figures,
    # error entries carried (value None) rather than dropped
    assert s["configs"]["config2"] == {
        "value": 0.5, "vs_baseline": 21.0, "vs_reference_actual": 33.0}
    assert s["configs"]["config5"]["value"] is None
    assert s["detail_file"] == "/tmp/x/latest_full.json"
    assert "tpu_unreachable" not in s


def test_summary_is_one_compact_json_line():
    bench = _load_bench()
    # five configs with fat stage tables must NOT fatten the summary: the
    # round-4 truncation was ~8 KB of stage tables on one line
    extra = {f"config{n}": {"value": 1.0, "vs_baseline": 10.0,
                            "vs_reference_actual": 12.0,
                            "stages_ms": {str(i): float(i)
                                          for i in range(40)}}
             for n in range(2, 6)}
    s = bench.build_summary(_result(extra_configs=extra), [])
    line = json.dumps(s)
    assert "\n" not in line
    assert len(line) < 1500, len(line)  # driver tail capture headroom
    assert json.loads(line)["configs"]["config3"]["vs_baseline"] == 10.0
    assert "stages_ms" not in line  # detail stays in the file


def test_summary_degraded_modes():
    bench = _load_bench()
    # unreachable-TPU runs label themselves; device figures may be absent
    r = _result(tpu_unreachable=True)
    del r["device_only_frames_per_s"]
    r["device_attached"] = {"skipped": "tpu unreachable"}
    r.pop("vs_reference_actual")
    s = bench.build_summary(r)
    assert s["tpu_unreachable"] is True
    assert s["device_only_frames_per_s"] is None
    assert s["device_resident_e2e_s"] is None
    assert s["vs_reference_actual"] is None
    assert s["detail_file"] is None
