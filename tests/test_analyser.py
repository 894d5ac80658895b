"""Spectral-analyser tests: atlas, auto-dispersion, GOTO, previews."""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.analyser import (
    SolarAtlas,
    SpectralAnalyser,
    auto_dispersion,
    goto_shift,
)
from solex_ser_recon_en_tpu.analyser.atlas import anchor_table, target_table, load_atlas
from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan


def test_line_tables():
    waves, names, labelled = anchor_table()
    assert 6562.808 in waves  # H-alpha
    assert len(waves) == len(names) == len(labelled) == 12
    tw, tn, tl = target_table()
    assert 5875.618 in tw  # He D3
    assert labelled[0].startswith(names[0])


def test_atlas_npz_roundtrip(tmp_path):
    atlas = SolarAtlas.synthetic(first=5000, last=5100, step=0.01)
    p = str(tmp_path / "atlas.npz")
    np.savez(
        p,
        y=(atlas.intensity * 255).astype(np.uint8),
        first=np.int32(5000),
        last=np.int32(5100),
        step=np.float64(0.01),
    )
    back = SolarAtlas.from_npz(p)
    assert back.first == 5000 and back.step == 0.01
    assert back.wavelengths.shape == back.intensity.shape
    assert np.abs(back.intensity - atlas.intensity).max() < 1 / 255 + 1e-9


def test_auto_dispersion_recovers_scale():
    """Synthesise a spectrum from the atlas at a known Å/px and recover it."""
    atlas = SolarAtlas.synthetic()
    true_disp = 0.065
    anchor_wl = 6562.808
    W = 240
    anchor_x = 120.0
    lam = anchor_wl + (np.arange(W) - anchor_x) * true_disp
    idx = np.clip(((lam - atlas.first) / atlas.step).astype(int), 0, len(atlas.intensity) - 1)
    spectrum = 40000 * atlas.intensity[idx] + 200
    d, corr = auto_dispersion(spectrum, anchor_x, anchor_wl, atlas)
    assert corr > 0.8
    assert d == pytest.approx(true_disp, abs=0.002)


def test_goto_shift_statuses():
    curve = np.full(100, 50.0)
    s, status = goto_shift(6562.808 + 1.0, 6562.808, 0.05, curve, 300)
    assert s == 20 and status == "ok"
    s, status = goto_shift(7000.0, 6562.808, 0.05, curve, 300)
    assert status == "out"
    curve2 = np.linspace(-100, 250, 100)
    s, status = goto_shift(6562.808, 6562.808, 0.05, curve2, 300)
    assert status == "partial"


@pytest.fixture(scope="module")
def analyser(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("an") / "scan.ser")
    scan = SyntheticScan(
        ih=220, iw=120, frames=180, depth=16,
        line_poly=(60.0, 0.0, 0.0, 0.0), disk_radius=70.0,
        noise=0.002, seed=9,
    )
    scan.write(p)
    return SpectralAnalyser(p)


def test_analyser_load_and_state(analyser):
    st = analyser.state
    assert st.spectrum.shape == (120,)
    assert st.anchor_x == pytest.approx(60.0, abs=1.5)
    assert analyser.options.ratio_fixe is not None  # ellipse fit ran


def test_analyser_preview_and_save(analyser, tmp_path):
    cl, pr = analyser.preview(0)
    assert cl.ndim == 2 and pr.shape == cl.shape
    base = str(tmp_path / "out")
    cl2, pr2 = analyser.save(0, base)
    import os

    assert os.path.exists(base + "_clahe.png")
    assert os.path.exists(base + "_protus.png")
    # preview runs at downscale_f = max(1000, ih/3)/ih (an upscale for small
    # scans — reference quirk, spectralAnalyserUI.py:161-162)
    f = analyser.state.downscale_f
    assert cl.shape[0] == pytest.approx(cl2.shape[0] * f, rel=0.05)


def test_analyser_dispersion_and_goto(analyser):
    d = analyser.find_dispersion(6562.808)
    assert 0.02 <= d <= 0.12
    shift, status = analyser.shift_for(6562.808 + 0.5, 6562.808)
    assert shift == int(0.5 / d)
    wl = analyser.wavelength_of_shift(shift, 6562.808)
    assert wl == pytest.approx(6562.808 + shift * d)
