"""Brightness rescaling and percentiles (device ops).

reference: solex_util.py:519-525 (rescale_brightness), :535-541 (percentile
stretch levels for the final products).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sat",))
def _rescale(img, lo, hi, alpha, sat: int):
    x = (jnp.float32(sat) * alpha * (img.astype(jnp.float32) - lo)) / (hi - lo)
    return jnp.clip(x, 0, sat).astype(jnp.uint16 if sat > 255 else jnp.uint8)


def rescale_brightness(img, lo, hi, alpha: float = 1.0):
    """Linear stretch of an integer image to [0, dtype max], clipped.

    reference: solex_util.py:519-525 (computes in float to avoid integer
    multiplication overflow, clips, casts back to the input dtype).
    """
    sat = 65535 if img.dtype in (jnp.uint16, "uint16") else 255
    if not (sat >= hi > lo):
        raise ValueError(f"need sat >= hi > lo, got {sat} >= {hi} > {lo}")
    return _rescale(jnp.asarray(img), jnp.float32(lo), jnp.float32(hi), jnp.float32(alpha), sat)


@jax.jit
def _percentile(img, q):
    return jnp.percentile(img.astype(jnp.float32).ravel(), q)


def percentile(img, q: float) -> float:
    """np.percentile-compatible (linear interpolation) on device."""
    return float(_percentile(jnp.asarray(img), jnp.float32(q)))
