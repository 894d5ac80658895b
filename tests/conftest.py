"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (set SOLEX_TEST_TPU=1 to run on a real chip).
Must run before the first jax import anywhere in the test session.
"""

import os

if os.environ.get("SOLEX_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the suite runs on the CPU backend, where the pipeline would take the
    # cv2/numpy product core by default — pin the XLA product programs so
    # they stay covered here (the host twin has its own equivalence test,
    # which flips this per-test)
    os.environ.setdefault("SOLEX_HOST_PRODUCTS", "0")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # jax may already be imported (sitecustomize preloads it on this image);
    # the config update below wins as long as no device backend has been
    # initialised yet.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan  # noqa: E402


@pytest.fixture(scope="session")
def basic_scan(tmp_path_factory):
    """A small default synthetic scan written to disk, with ground truth."""
    path = str(tmp_path_factory.mktemp("scans") / "basic.ser")
    scan = SyntheticScan(
        ih=256,
        iw=96,
        frames=200,
        depth=16,
        line_poly=(48.0, 0.02, -1e-4, 2e-7),
        noise=0.002,
        seed=1,
    )
    frames = scan.write(path, transpose_to_wide=True)
    return {"path": path, "scan": scan, "frames": frames}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def microx_display():
    """One in-repo X display (gui/microx.py) for every real-toolkit GUI
    test in the session.

    Session-scoped and never torn down mid-run: a Tk client whose display
    dies exits the whole process via Xlib's XIO handler, so per-module
    servers would kill pytest the moment a later module opened a fresh
    display.  The server subprocess carries PR_SET_PDEATHSIG and dies
    with this process instead of an explicit stop().
    """
    from solex_ser_recon_en_tpu.gui.microx import MicroXServer

    h = MicroXServer.spawn()
    old = os.environ.get("DISPLAY")
    os.environ["DISPLAY"] = h.display
    yield h.display
    if old is None:
        os.environ.pop("DISPLAY", None)
    else:
        os.environ["DISPLAY"] = old
