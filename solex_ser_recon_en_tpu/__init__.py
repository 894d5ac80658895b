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

import os as _os


def _host_feature_tag() -> str:
    """Short tag of this host's CPU feature set + architecture.

    XLA:CPU persists AOT-compiled host code in the compilation cache; an
    entry built on a machine with a different vector-extension set loads
    with "Compile machine features" warnings and can SIGILL at run time.
    Keying the cache directory by the feature set gives each host class
    its own cache instead of sharing stale AOT entries across machines.
    """
    import hashlib as _hashlib
    import platform as _platform

    feats = ""
    # XLA tunes per MODEL, not just per flag set: e.g. prefer-no-scatter/
    # prefer-no-gather is chosen for CPU models hit by the slow-gather
    # mitigation, so two hosts with identical cpuinfo *flags* can still
    # produce mutually-warning AOT entries.  Fold model identity in.
    ident = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if not feats and key in ("flags", "Features"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                elif key in ("vendor_id", "cpu family", "model",
                             "model name", "stepping") and key not in ident:
                    ident[key] = line.split(":", 1)[1].strip()
                if feats and len(ident) >= 5:
                    break
    except OSError:
        pass
    model = ";".join(f"{k}={ident[k]}" for k in sorted(ident))
    raw = f"{_platform.machine()}:{model}:{feats}".encode()
    return _hashlib.sha256(raw).hexdigest()[:12]


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (first TPU compile of the
    product kernels is tens of seconds; cached reruns are milliseconds).
    Disable with SOLEX_NO_COMPILE_CACHE=1."""
    if _os.environ.get("SOLEX_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        base_dir = _os.environ.get(
            "SOLEX_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "solex_xla_cache"),
        )
        # per-host-class subdirectory: see _host_feature_tag
        cache_dir = _os.path.join(base_dir, _host_feature_tag())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .config import Options  # noqa: F401,E402
