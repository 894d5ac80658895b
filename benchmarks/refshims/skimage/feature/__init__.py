"""skimage.feature.canny shim — backed by the repo's jax-free numpy
canny (solex_ser_recon_en_tpu/ops/canny_host.py), loaded by file path so
the reference's forked Pool workers never touch jax."""
from _load import load

_c = load("solex_ser_recon_en_tpu/ops/canny_host.py", "_repo_canny_host")

canny = _c.canny
