"""Front-end layer tests: form validation, i18n, clahe tool, config."""

import json
import os

import numpy as np
import pytest

from solex_ser_recon_en_tpu.config import Options
from solex_ser_recon_en_tpu.gui.form import default_form_values, interpret_form_values
from solex_ser_recon_en_tpu.i18n import get_lang, read_langs, tr
from solex_ser_recon_en_tpu.cli.clahe_tool import apply_clahe, read_ini as clahe_ini
from solex_ser_recon_en_tpu.io.png import write_png, read_image


def test_form_roundtrip(tmp_path):
    opts = Options()
    v = default_form_values(opts)
    f = tmp_path / "a.ser"
    f.write_bytes(b"x")
    v["-FILE-"] = str(f)
    files = interpret_form_values(opts, v)
    assert files == [str(f)]
    assert opts.shift == [0]
    assert opts.trans_strength == 301


def test_form_validation_errors(tmp_path):
    opts = Options()
    v = default_form_values(opts)
    v["-FILE-"] = "nonexistent.ser"
    with pytest.raises(ValueError, match="ERROR opening file"):
        interpret_form_values(opts, v)
    v2 = default_form_values(opts)
    v2["_y/x_ratio"] = "abc"
    with pytest.raises(ValueError, match="invalid Y/X ratio"):
        interpret_form_values(opts, v2, no_file=True)
    v3 = default_form_values(opts)
    v3["_pixel_offset"] = "5:1"
    with pytest.raises(ValueError, match="lower bound greater"):
        interpret_form_values(opts, v3, no_file=True)
    v4 = default_form_values(opts)
    v4["_pixel_offset"] = "x,y"
    with pytest.raises(ValueError, match="invalid pixel offset"):
        interpret_form_values(opts, v4, no_file=True)


def test_form_folder_mode(tmp_path):
    opts = Options(selected_mode="Folder input mode")
    v = default_form_values(opts)
    v["input_dir"] = str(tmp_path)
    files = interpret_form_values(opts, v)
    assert files == []
    assert opts.input_dir == str(tmp_path)


def test_i18n_all_13_languages_ship():
    """Full data-asset parity: the reference ships 13 language dicts
    (language_data/dict_lang_*.txt); every one must load, translate the
    complete English key set, and carry a flag icon that exists."""
    import os

    from solex_ser_recon_en_tpu.i18n import _BUILTIN

    langs, dicts = read_langs()
    want = {
        "English", "Français", "Deutsch", "Español", "Italiano", "日本語",
        "한국어", "Монгол", "Português", "简体中文", "繁體中文", "Українська",
    }
    assert want <= set(langs), set(langs)
    en_keys = {k for k in get_lang("English") if not k.startswith("_")}
    for name, d in zip(langs, dicts):
        missing = en_keys - set(d)
        assert not missing, f"{name} missing {missing}"
        flag = d.get("_flag_icon")
        assert flag and os.path.exists(os.path.join(_BUILTIN, flag)), name
        # every value is a non-empty string (hot-swap safe)
        assert all(isinstance(v, str) and v for v in d.values()), name


def test_i18n_languages():
    langs, dicts = read_langs()
    assert "English" in langs and "Français" in langs
    fr = get_lang("Français")
    assert tr(fr, "Mirror X") == "Miroir X"
    assert tr(fr, "unknown key!") == "unknown key!"
    en = get_lang("NoSuchLanguage")  # falls back to English
    assert en["_lang_name"] == "English"


def test_i18n_reads_reference_format_dicts(tmp_path, monkeypatch):
    d = tmp_path / "language_data"
    d.mkdir()
    (d / "dict_lang_XX.txt").write_text(
        json.dumps({"_lang_name": "Xx", "Mirror X": "Xpiegel M"}), encoding="utf-8"
    )
    monkeypatch.setenv("SOLEX_LANGUAGE_DATA", str(d))
    langs, dicts = read_langs()
    assert "Xx" in langs


def test_clahe_tool(tmp_path, rng):
    img = rng.integers(0, 65536, size=(64, 64), dtype=np.uint16)
    p = str(tmp_path / "img.png")
    write_png(p, img)
    options = dict(clahe_ini("/nonexistent"))  # defaults
    out = apply_clahe(p, options, write_file=True)
    assert os.path.exists(str(tmp_path / "img_clahe.png"))
    import cv2

    ref = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(img)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # stretch path
    options.update({"do_stretch": True, "lo": 5, "hi": 95, "sat": 80})
    out2 = apply_clahe(p, options, write_file=False)
    assert out2.max() <= 65535


def test_options_json_roundtrip_reference_keys(tmp_path):
    """SHG_config.txt written by the reference loads unchanged."""
    ref_cfg = {
        "language": "Français",
        "shift": [5],
        "de-vignette": True,
        "trans_strength": 201,
        "unknown_future_key": 1,
    }
    p = tmp_path / "SHG_config.txt"
    p.write_text(json.dumps(ref_cfg))
    opts = Options.load(str(p))
    assert opts.language == "Français"
    assert opts.shift == [5]
    assert opts.de_vignette is True
    assert opts.trans_strength == 201
    opts.save(str(p))
    saved = json.loads(p.read_text())
    assert saved["de-vignette"] is True  # reference key name preserved
    assert "shift_requested" not in saved


def test_cli_profile_flag(tmp_path, monkeypatch):
    """--profile wraps the run in a jax.profiler trace."""
    import numpy as np

    from solex_ser_recon_en_tpu.cli.main import main
    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    monkeypatch.chdir(tmp_path)
    scan = SyntheticScan(ih=128, iw=48, frames=60, depth=16,
                         line_poly=(24.0, 0.0, 0.0, 0.0), noise=0.003, seed=2)
    scan.write("p.ser")
    trace_dir = str(tmp_path / "trace")
    rc = main([f"--profile={trace_dir}", "-cx", "-w0", "p.ser"])
    assert rc == 0
    import os

    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)


def test_cli_profile_writes_trace(basic_scan, tmp_path):
    """--profile wraps the run in a jax.profiler trace (SURVEY §5.1)."""
    import os

    import shutil

    from solex_ser_recon_en_tpu.cli.main import main

    scan = str(tmp_path / "p.ser")  # products land next to the scan
    shutil.copy(basic_scan["path"], scan)
    trace = tmp_path / "trace"
    rc = main(["--profile=" + str(trace), "-c", "-w0", scan])
    assert rc == 0
    found = [f for _, _, fs in os.walk(trace) for f in fs]
    assert found, "no profiler trace files written"


def test_shift_spec_fuzz_and_bound():
    """parse_shift_spec never crashes with anything but ValueError, and a
    typo'd huge range fails fast instead of materialising 1e8 shifts."""
    import random
    import string

    import pytest

    from solex_ser_recon_en_tpu.cli.flags import parse_shift_spec

    with pytest.raises(ValueError):
        parse_shift_spec("0:99999999")
    assert parse_shift_spec("-5:5:5") == [-5, 0, 5]

    rng = random.Random(0)
    chars = string.digits + ":,-+ab. "
    for _ in range(2000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 10)))
        try:
            out = parse_shift_spec(s)
        except ValueError:
            continue
        assert isinstance(out, list)
        assert all(isinstance(x, int) for x in out)
        assert len(out) <= 10_000


def test_read_ini_corrupt_config_falls_back(tmp_path):
    """Corrupt/garbage SHG_config.txt yields default Options, like the
    reference's read_ini (SHG_MAIN.py:75-85)."""
    from solex_ser_recon_en_tpu.cli.main import read_ini
    from solex_ser_recon_en_tpu.config import Options

    defaults = Options()
    for name, data in {
        "garbage.txt": b"\x00\xffnot json{{{",
        "empty.txt": b"",
        "null.txt": b"null",
        "missing.txt": None,
    }.items():
        p = tmp_path / name
        if data is not None:
            p.write_bytes(data)
        o = read_ini(str(p))
        assert o.shift == defaults.shift
        assert o.trans_strength == defaults.trans_strength


def test_every_module_imports():
    """Every module in the package imports cleanly (GUI modules are gated
    on FreeSimpleGUI's absence, native on the toolchain)."""
    import importlib
    import pkgutil

    import solex_ser_recon_en_tpu as pkg

    failed = []
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        if m.name.endswith("__main__"):
            continue  # runs the CLI on import by design
        try:
            importlib.import_module(m.name)
        except Exception as e:  # pragma: no cover - the assert reports
            failed.append((m.name, repr(e)))
    assert not failed, failed


def test_num_processes_folder_split(tmp_path, monkeypatch):
    """--num-processes/--process-id: each process handles a disjoint,
    collectively-exhaustive share of the folder batch (VERDICT: multi-host
    DCN split as a product feature; reference analogue Solex_recon.py:30)."""
    import subprocess
    import sys

    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan

    folder = tmp_path / "batch"
    folder.mkdir()
    scan = SyntheticScan(ih=96, iw=64, frames=40, depth=16,
                         line_poly=(32.0, 0.0, 0.0, 0.0), noise=0.002, seed=2)
    for i in range(4):
        scan.write(str(folder / f"s{i}.ser"), transpose_to_wide=True)

    outs = {}
    for pid in (0, 1):
        outdir = tmp_path / f"out{pid}"
        outdir.mkdir()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
        rc = subprocess.run(
            [sys.executable, "-m", "solex_ser_recon_en_tpu.cli", "-cpw0",
             "--num-processes", "2", "--process-id", str(pid),
             "--input-dir", str(folder)],
            env=env, capture_output=True, text=True, cwd=str(tmp_path),
            timeout=600)
        assert rc.returncode == 0, rc.stderr[-2000:]
        outs[pid] = {f.name.split("_")[0] for f in outdir.iterdir()
                     if f.name.endswith("_clahe.png")}
    # files processed in the input folder itself? outputs land next to
    # input when no output_dir: collect from folder instead
    produced = {p.name.split("_")[0] for p in folder.iterdir()
                if p.name.endswith("_clahe.png")}
    assert produced == {"s0", "s1", "s2", "s3"}

    # the split itself is deterministic, disjoint, and exhaustive
    from solex_ser_recon_en_tpu.parallel.distributed import assign_files

    files = sorted(str(folder / f"s{i}.ser") for i in range(4))
    a = assign_files(files, 2, 0)
    b = assign_files(files, 2, 1)
    assert set(a) | set(b) == set(files)
    assert not set(a) & set(b)


def test_num_processes_env_fallback(monkeypatch):
    from solex_ser_recon_en_tpu.cli.flags import parse_cli
    from solex_ser_recon_en_tpu.config import Options

    monkeypatch.setenv("SOLEX_NUM_PROCESSES", "4")
    monkeypatch.setenv("SOLEX_PROCESS_ID", "3")
    o = Options()
    parse_cli(o, [])
    assert (o.num_processes, o.process_id) == (4, 3)
    o.validate()

    # explicit flags beat env
    o2 = Options()
    parse_cli(o2, ["--num-processes=2", "--process-id=1"])
    assert (o2.num_processes, o2.process_id) == (2, 1)

    # runtime-only: never persisted
    import json
    import tempfile
    with tempfile.NamedTemporaryFile("r", suffix=".txt") as fp:
        o2.save(fp.name)
        saved = json.load(open(fp.name))
    assert "num_processes" not in saved and "process_id" not in saved


def test_cli_output_dir_and_bad_fixed_width(tmp_path):
    """--output-dir is a long option (created on parse); a bare -r without
    its width exits cleanly instead of raising ValueError."""
    from solex_ser_recon_en_tpu.cli.flags import parse_cli

    opts = Options()
    out = str(tmp_path / "products" / "nested")
    files = parse_cli(opts, ["-cw0", "--output-dir", out, "x.ser"])
    assert opts.output_dir == out and os.path.isdir(out)
    assert opts.clahe_only and files == ["x.ser"]
    opts2 = Options()
    files2 = parse_cli(opts2, [f"--output-dir={out}", "y.avi"])
    assert opts2.output_dir == out and files2 == ["y.avi"]
    with pytest.raises(SystemExit) as e:
        parse_cli(Options(), ["-r"])
    assert e.value.code == 1


def test_cli_output_dir_uncreatable_exits_cleanly(tmp_path):
    from solex_ser_recon_en_tpu.cli.flags import parse_cli

    blocker = tmp_path / "file"
    blocker.write_text("x")
    with pytest.raises(SystemExit) as e:
        parse_cli(Options(), ["--output-dir", str(blocker / "sub")])
    assert e.value.code == 1
