"""Execution placement for small-image device ops.

The geometry/line-fit stages run jitted XLA programs over *small* arrays
(<= a few MB: the blurred mean image, the 4x-downscaled disk for Canny).
On a normally-attached TPU those ride along for free; on hosts where the
accelerator link is a throttled relay, every one of those ops costs two
link round trips that dwarf the compute.  When the pipeline's feed policy
detects such a link it routes the small ops to XLA:CPU — the SAME jitted
code, same results, zero link traffic.

This is a placement decision, not an implementation fork: callers wrap the
op in ``with small_ops():`` and JAX's ``default_device`` does the rest.
"""

from __future__ import annotations

import contextlib
import threading

# THREAD-local: the batch pipeline overlaps file N's post-processing (pool
# thread) with file N+1's read (main thread, which decides ITS feed
# policy) — a process-global flag would race the policy across files.
# Each stage-entry point re-asserts its file's decision on its own thread
# (pipeline/run.py).
_TLS = threading.local()


def set_small_ops_on_host(flag: bool) -> None:
    _TLS.value = bool(flag)


def small_ops_on_host() -> bool:
    return getattr(_TLS, "value", False)


def set_host_pipeline(flag: bool) -> None:
    """Full-host mode: the feed policy chose the host pass ("host" feed —
    NOT "band", whose disks live on the accelerator), so the bulk stages
    (warp, transversalium stats, product core) also run host-side and the
    accelerator link carries nothing after recon.  Thread-local like the
    small-ops flag and re-asserted per stage entry."""
    _TLS.pipe = bool(flag)


def host_pipeline() -> bool:
    return getattr(_TLS, "pipe", False)


def host_ops():
    """Context manager placing bulk-stage jax ops per the host-pipeline
    decision (same mechanics as small_ops)."""
    if host_pipeline():
        import jax

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return contextlib.nullcontext()
        if jax.default_backend() == "cpu":
            return contextlib.nullcontext()
        return jax.default_device(cpu)
    return contextlib.nullcontext()


def small_ops():
    """Context manager placing the enclosed jax ops per the current policy."""
    if small_ops_on_host():
        import jax

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:  # no CPU backend registered (rare)
            return contextlib.nullcontext()
        if jax.default_backend() == "cpu":
            return contextlib.nullcontext()  # already there
        return jax.default_device(cpu)
    return contextlib.nullcontext()


def tpu_placement() -> bool:
    """True when ops dispatched under the CURRENT placement land on a TPU.

    ``jax.default_backend()`` ignores an active ``jax.default_device``
    context, so kernels gated on it alone would lower TPU-only code
    (pallas, MXU one-hot shapes) inside ``small_ops()``/``host_ops()``
    blocks that the feed policy redirected to XLA:CPU.  Reading the
    config value sees the context (it is part of the jit cache key, so a
    per-placement trace-time branch is safe)."""
    import jax

    dd = jax.config.jax_default_device
    if dd is not None:
        if isinstance(dd, str):
            return dd == "tpu"
        return getattr(dd, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"
