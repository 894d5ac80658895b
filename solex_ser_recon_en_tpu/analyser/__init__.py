"""Spectral analyser: atlas-correlation auto-dispersion + GOTO line/shift.

reference: spectralAnalyserUI.py (the interactive tool behind the main
GUI's "Pixel offset live" button, UI_handler.py:273-279).  The numeric core
is headless here (``SpectralAnalyser``); front ends live on top of it.
"""

from .atlas import SolarAtlas, load_lines  # noqa: F401
from .core import SpectralAnalyser, auto_dispersion, goto_shift  # noqa: F401
