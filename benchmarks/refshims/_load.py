"""Load repo modules by FILE PATH, bypassing the package __init__ chain.

The reference forks a multiprocessing Pool (Solex_recon.py:30); forking a
jax-threaded parent deadlocks, so the shims must never import jax — but
``import solex_ser_recon_en_tpu`` runs the package __init__ (compilation
cache setup imports jax).  Every module loaded here is jax-free by
construction (no relative imports, numpy/stdlib only)."""
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this image's axon sitecustomize preloads jax into EVERY interpreter; the
# invariant we can hold is that no SHIM adds a jax import of its own (and
# none ever runs a jax op, which is what actually spins up the runtime
# threads that make fork unsafe)
_JAX_PRELOADED = "jax" in sys.modules


def load(relpath: str, name: str):
    if name in sys.modules:
        return sys.modules[name]
    path = os.path.join(REPO, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    assert _JAX_PRELOADED or "jax" not in sys.modules, f"{relpath} pulled jax"
    return mod
