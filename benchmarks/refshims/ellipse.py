"""lsq-ellipse shim: LsqEllipse backed by the repo's own Halir-Flusser fit
(solex_ser_recon_en_tpu/geometry/ellipse.py) — same (center, width, height,
phi) convention as the lsq-ellipse package the reference imports
(ellipse_to_circle.py:27,57-59)."""
from _load import load

_e = load("solex_ser_recon_en_tpu/geometry/ellipse.py", "_repo_ellipse")


class LsqEllipse:
    def fit(self, points):
        self._params = _e.fit_ellipse(points)
        return self

    def as_parameters(self):
        center, width, height, phi = self._params
        return tuple(center), width, height, phi

    def return_fit(self, n_points=100):
        center, width, height, phi = self._params
        return _e.ellipse_points(center, width, height, phi, n=n_points)
