"""Imported (with skimage.data._fetchers) for py-2-exe packaging only."""
from . import _fetchers  # noqa: F401
