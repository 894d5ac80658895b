"""astropy.io.fits shim: the Header/PrimaryHDU/writeto surface the
reference uses (solex_util.py:148-161,205-206; Solex_recon.py:81,138,151),
backed by the repo's own FITS writer (solex_ser_recon_en_tpu/io/fits.py)."""
import numpy as np
from _load import load

_fits = load("solex_ser_recon_en_tpu/io/fits.py", "_repo_fits")


class Header(dict):
    pass


class PrimaryHDU:
    def __init__(self, data=None, header=None):
        self.data = np.asarray(data)
        self.header = dict(header or {})

    def writeto(self, path, overwrite=False):
        _fits.write_fits(path, self.data, self.header)
