"""Solar reference atlas + spectral line tables.

reference: spectralAnalyserUI.py:61-65 loads ``language_data/alps.npz``
(700,000 uint8 samples of a solar atlas covering 3000-10000 Å at 0.01 Å/px:
keys y/first/last/step) plus two line tables (line_data/*.txt, format
"<wavelength> <name>").

We keep the same .npz schema so a user's atlas file drops in unchanged.
Without one, a synthetic atlas is built from the known line tables
(Gaussian absorption profiles on a flat continuum) — enough for the
correlation machinery and tests; for observatory-grade dispersion accuracy
point ``atlas_path`` at a real atlas export (e.g. BASS2000).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def load_lines(path: str) -> Tuple[List[float], List[str], List[str]]:
    """Parse a line table; returns (wavelengths, names, labelled names).

    reference: spectralAnalyserUI.py:50-58.
    """
    waves, names = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) < 2:
                continue
            waves.append(float(parts[0]))
            names.append(parts[1].strip())
    labelled = [f"{names[i]}({waves[i]})" for i in range(len(names))]
    return waves, names, labelled


def anchor_table() -> Tuple[List[float], List[str], List[str]]:
    return load_lines(os.path.join(_DATA_DIR, "anchor_candidates.txt"))


def target_table() -> Tuple[List[float], List[str], List[str]]:
    return load_lines(os.path.join(_DATA_DIR, "line_targets.txt"))


@dataclass
class SolarAtlas:
    """wavelengths[i] = first + i*step (Å); intensity in [0, 1]."""

    intensity: np.ndarray
    first: float
    last: float
    step: float

    @property
    def wavelengths(self) -> np.ndarray:
        return np.arange(self.first, self.last, self.step)[: len(self.intensity)]

    def table(self) -> np.ndarray:
        """(N, 2) [wavelength, intensity] like the reference's line_data
        (spectralAnalyserUI.py:62)."""
        return np.stack([self.wavelengths, self.intensity], axis=1)

    @classmethod
    def from_npz(cls, path: str) -> "SolarAtlas":
        z = np.load(path)
        return cls(
            intensity=z["y"].astype(np.float64) / 255.0,
            first=float(z["first"]),
            last=float(z["last"]),
            step=float(z["step"]),
        )

    @classmethod
    def synthetic(
        cls,
        first: float = 3000.0,
        last: float = 10000.0,
        step: float = 0.01,
        extra_lines: Optional[List[Tuple[float, float, float]]] = None,
    ) -> "SolarAtlas":
        """Flat continuum with Gaussian absorption at the known solar lines
        (+ a dense comb of weak Fraunhofer-like lines so correlations have
        structure away from the anchors)."""
        wl = np.arange(first, last, step)
        inten = np.ones_like(wl)
        lines: List[Tuple[float, float, float]] = []
        for w in anchor_table()[0] + target_table()[0]:
            lines.append((w, 0.7, 0.35))
        # dense Fraunhofer-like comb: ~2 lines/Å so any few-Å window has
        # enough structure for the correlation to discriminate scale
        rng = np.random.default_rng(12345)
        n_comb = int((last - first) * 2)
        for w in rng.uniform(first, last, n_comb):
            lines.append((float(w), rng.uniform(0.08, 0.5), rng.uniform(0.03, 0.12)))
        if extra_lines:
            lines += list(extra_lines)
        for center, depth, sigma in lines:
            lo = np.searchsorted(wl, center - 6 * sigma)
            hi = np.searchsorted(wl, center + 6 * sigma)
            if lo >= hi:
                continue
            seg = wl[lo:hi]
            inten[lo:hi] *= 1 - depth * np.exp(-0.5 * ((seg - center) / sigma) ** 2)
        return cls(intensity=inten, first=first, last=last, step=step)


def load_atlas(path: Optional[str] = None) -> SolarAtlas:
    """Load the atlas from ``path``, common locations, or synthesise one."""
    candidates = [path] if path else []
    candidates += [
        os.environ.get("SOLEX_ATLAS"),
        os.path.join(_DATA_DIR, "atlas.npz"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return SolarAtlas.from_npz(c)
    return SolarAtlas.synthetic()
