"""Geometric analysis: spectral-line fit, limb ellipse fit, correction math."""

from .linefit import detect_bord, fit_spectral_line, LineFit  # noqa: F401
from .ellipse import fit_ellipse, two_step, get_correction_matrix  # noqa: F401
from .correct import (  # noqa: F401
    correct_image,
    ellipse_to_circle,
    GeometryResult,
    Circle,
    NO_CIRCLE,
)
