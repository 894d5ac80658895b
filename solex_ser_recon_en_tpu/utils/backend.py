"""Accelerator-backend responsiveness guard.

A dead/wedged accelerator transport can leave ``jax.devices()`` (and
therefore the first ``jnp`` operation) hung forever — observed on this
project's relay-attached hosts, where device discovery sits in a retry
loop while the tunnel is down.  A CLI run that hangs before printing
anything is strictly worse than one that computes on the CPU backend and
says so.

``ensure_responsive_backend`` probes device discovery in a SUBPROCESS
(an in-process hang would pin jax's backend lock, making any later
fallback impossible) and pins this process to the CPU backend via the
config API when the accelerator never answers.  The config-level update
matters: accelerator site hooks can re-force ``jax_platforms`` at plugin
registration, overriding the ``JAX_PLATFORMS`` env var.

The probe costs one subprocess jax import (~seconds), so callers gate it
to environments where a hang is plausible (see ``relay_attached``).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBED: dict = {}


def accelerator_answers(timeout_s: float = 120.0) -> bool:
    """One bounded subprocess device-discovery probe (shared by the CLI
    guard, bench.py and __graft_entry__).  Fast on fast failure: a
    discovery that crashes immediately returns False immediately —
    only a genuine hang costs the full timeout."""
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def relay_attached() -> bool:
    """True when this host reaches its accelerator through a tunnel/relay
    whose discovery can hang (the environments where the probe pays)."""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")
                or os.environ.get("SOLEX_BACKEND_PROBE"))


def ensure_responsive_backend(timeout_s: float = 120.0,
                              quiet: bool = False) -> bool:
    """Pin to the CPU backend if accelerator discovery never answers.

    Returns True when the accelerator answered (nothing changed).
    Memoised per process; a no-op when the process is already CPU-pinned.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor the env var against site hooks that re-force the
        # accelerator platform at plugin registration
        import jax

        jax.config.update("jax_platforms", "cpu")
        return True
    if "ok" in _PROBED:
        return _PROBED["ok"]
    if accelerator_answers(timeout_s):
        _PROBED["ok"] = True
        return True
    _PROBED["ok"] = False
    if not quiet:
        print("warning: accelerator device discovery did not answer within "
              f"{timeout_s:.0f}s; running on the CPU backend",
              file=sys.stderr, flush=True)
    import jax

    jax.config.update("jax_platforms", "cpu")
    return False
