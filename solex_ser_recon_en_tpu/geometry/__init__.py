"""Geometric analysis: spectral-line fit, limb ellipse fit, correction math."""

from .linefit import detect_bord, fit_spectral_line, LineFit  # noqa: F401
