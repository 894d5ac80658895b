"""scikit-image shim (see refshims/README.md): only the surface the
reference calls is provided."""
from . import data, feature, filters, transform  # noqa: F401
