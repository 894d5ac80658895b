"""The staged reconstruction pipeline (reference: Solex_recon.py)."""

from .transversalium import correct_transversalium, tukey_taper  # noqa: F401
from .vignette import remove_vignette  # noqa: F401
from .products import image_process, crop_width  # noqa: F401
