"""Mean filters used by the stubborn-transversalium path.

reference: solex_util.py:293-323 — ``cv2.filter2D`` with (a) a
(2*half_width+1, linlen) ones kernel whose centre row is zeroed and (b) a
(1, linlen) ones kernel, both normalised and with BORDER_REFLECT_101.
Expressed as separable window sums on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .blur import _window_sum_1d


@partial(jax.jit, static_argnames=("linlen", "half_width"))
def mean_filter_hole(img: jax.Array, linlen: int, half_width: int) -> jax.Array:
    """Normalised correlation with ones((2hw+1, linlen)) minus its centre row."""
    f = img.astype(jnp.float32)
    row_sums = _window_sum_1d(f, linlen, f.ndim - 1, jnp.float32)  # (H, W)
    full = _window_sum_1d(row_sums, 2 * half_width + 1, f.ndim - 2, jnp.float32)
    hole = full - row_sums
    return hole / jnp.float32(2 * half_width * linlen)


@partial(jax.jit, static_argnames=("linlen",))
def mean_filter_line(img: jax.Array, linlen: int) -> jax.Array:
    """Normalised correlation with ones((1, linlen))."""
    f = img.astype(jnp.float32)
    return _window_sum_1d(f, linlen, f.ndim - 1, jnp.float32) / jnp.float32(linlen)
