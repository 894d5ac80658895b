"""solex_ser_recon_en_tpu — TPU-native spectroheliograph (SHG / Sol'Ex) reconstruction.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``thelondonsmiths/Solex_ser_recon_EN`` desktop application: it reconstructs a
monochromatic solar disk from a spectroheliograph video scan (SER/AVI), then
applies geometric and photometric corrections and writes FITS/PNG products.

Architecture (TPU-first, not a port):

- ``io/``        host-side SER/AVI demuxers, FITS/PNG writers, synthetic scan
                 generator, double-buffered host->HBM feeders.
- ``ops/``       device kernels (XLA + Pallas): batched multi-shift
                 gather/one-hot-matmul reconstruction, streaming mean/max,
                 separable box blur, Savitzky-Golay convolution, CLAHE,
                 projective warp, Canny edges, percentile stretches.
- ``geometry/``  spectral-line polynomial fit, direct least-squares conic
                 (ellipse) fit, correction-matrix math.
- ``pipeline/``  the staged reconstruction pipeline (the equivalent of the
                 reference's Solex_recon orchestration).
- ``models/``    end-to-end jitted "models": the flagship SHG reconstruction
                 step and the spectral-analyser.
- ``parallel/``  jax.sharding meshes: frame-axis (sequence-parallel analogue)
                 and file-batch (data-parallel analogue) sharding.
- ``cli/``       reference-compatible command line front end
                 (flags d/c/f/m/p/r/s/t/w/x), folder batch + continuous mode.
- ``utils/``     run logs, timers, profiling hooks.

Reference parity map: see SURVEY.md at the repo root; individual modules cite
the reference behaviour they reproduce as ``reference: file.py:lines``.
"""

__version__ = "0.1.0"

from .config import Options  # noqa: F401
