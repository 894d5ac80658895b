"""Fused single-pass Pallas step (ops/fused_pallas.py) vs the XLA step.

Runs in Pallas interpret mode on CPU (tests/conftest.py); the same kernel
compiles on the real chip (SOLEX_TEST_TPU=1).
"""

import numpy as np
import pytest

from solex_ser_recon_en_tpu.models.shg import shg_forward, shg_forward_xla
from solex_ser_recon_en_tpu.ops.fused_pallas import shg_fused_pallas
from solex_ser_recon_en_tpu.ops.recon import build_shift_indices


def _case(rng, F, ih, iw, shifts):
    frames = rng.integers(0, 65536, (F, ih, iw), dtype=np.uint16)
    curve = iw / 2 + 0.03 * np.arange(ih) - 1e-4 * np.arange(ih) ** 2
    floor = np.floor(curve)
    ind_l, left_w = build_shift_indices(floor, curve - floor, shifts, iw)
    return frames, ind_l, left_w


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize(
    "F,ih,iw,shifts",
    [
        (37, 100, 60, [-2, 0, 3]),      # unaligned everything
        (16, 128, 32, [0]),             # aligned, single shift
        (9, 40, 24, [10, 0, -5, 5, 7]), # S=5 (beyond dispatcher crossover)
    ],
)
def test_fused_matches_xla(rng, F, ih, iw, shifts, mxu):
    frames, ind_l, left_w = _case(rng, F, ih, iw, shifts)
    ref = shg_forward_xla(frames, ind_l, left_w)
    out = shg_fused_pallas(frames, ind_l, left_w, fb=8, yb=32, mxu=mxu)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    # f32 lerp vs MXU dot: at most 1 LSB at truncation boundaries
    np.testing.assert_allclose(
        np.asarray(ref[2], dtype=int), np.asarray(out[2], dtype=int), atol=1
    )


def test_fused_edge_clipping(rng):
    """Shift indices clipped to [0, iw-2] (solex_util.py:117-118) behave
    identically when the line sits at the spectral edge."""
    F, ih, iw = 12, 48, 20
    frames = rng.integers(0, 65536, (F, ih, iw), dtype=np.uint16)
    curve = 1.0 + 0.02 * np.arange(ih)
    floor = np.floor(curve)
    ind_l, left_w = build_shift_indices(floor, curve - floor, [-30, 0, 30], iw)
    ref = shg_forward_xla(frames, ind_l, left_w)
    out = shg_fused_pallas(frames, ind_l, left_w, fb=8, yb=16)
    np.testing.assert_allclose(
        np.asarray(ref[2], dtype=int), np.asarray(out[2], dtype=int), atol=1
    )


def test_windowed_kernel_bit_identical(rng):
    """Wide spectral windows take the lane-windowed mask contraction
    (_kernel_win); it must be BIT-identical to the full-width kernel —
    the dropped terms are exact +0.0 contributions."""
    from solex_ser_recon_en_tpu.ops.fused_pallas import (
        _shg_fused, _window_for_indices,
    )
    import jax.numpy as jnp

    F, ih, iw = 24, 256, 300
    frames, ind_l, left_w = _case(rng, F, ih, iw, [-3, 0, 4])
    yb = 256  # single y tile on CPU path
    win = _window_for_indices(np.asarray(ind_l), iw, yb)
    assert win == 128  # smooth cubic spans far fewer than 128 columns
    w2 = jnp.asarray(left_w).astype(jnp.float32)[None, :]
    full = _shg_fused(jnp.asarray(frames), jnp.asarray(ind_l), w2, 8, yb, 0)
    wind = _shg_fused(jnp.asarray(frames), jnp.asarray(ind_l), w2, 8, yb, win)
    for a, b in zip(full, wind):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the public entry auto-picks the window with the same results
    out = shg_fused_pallas(frames, ind_l, left_w, fb=8, yb=yb)
    for a, b in zip(full, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_windowed_kernel_edge_lines(rng):
    """Lines hugging the spectral edges.  Left edge: base 0 covers the
    taps, the window engages.  Right edge with a non-lane-multiple iw:
    in-bounds lane-aligned slicing strands every window short of the
    taps, so the selector must fall back to full width (win=0) — and the
    public entry must stay correct either way."""
    from solex_ser_recon_en_tpu.ops.fused_pallas import (
        _shg_fused, _window_for_indices,
    )
    import jax.numpy as jnp

    F, ih, iw = 12, 128, 300
    yb = 128
    frames = rng.integers(0, 65536, (F, ih, iw), dtype=np.uint16)

    # left edge: windowable at 128
    curve = 1.0 + 0.01 * np.arange(ih)
    floor = np.floor(curve)
    ind_l, left_w = build_shift_indices(floor, curve - floor, [0, 1], iw)
    win = _window_for_indices(np.asarray(ind_l), iw, yb)
    assert win == 128
    w2 = jnp.asarray(left_w).astype(jnp.float32)[None, :]
    full = _shg_fused(jnp.asarray(frames), jnp.asarray(ind_l), w2, 8, yb, 0)
    wind = _shg_fused(jnp.asarray(frames), jnp.asarray(ind_l), w2, 8, yb, win)
    for a, b in zip(full, wind):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # right edge: base <= iw - win (in-bounds slice) lane-aligns away
    # from the taps for every win < iw -> full-width fallback
    curve = (iw - 3) + 0.01 * np.arange(ih)
    floor = np.floor(curve)
    ind_r, left_wr = build_shift_indices(floor, curve - floor, [0, 1], iw)
    assert _window_for_indices(np.asarray(ind_r), iw, yb) == 0
    ref = shg_forward_xla(frames, ind_r, left_wr)
    out = shg_fused_pallas(frames, ind_r, left_wr, fb=8, yb=yb)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_allclose(
        np.asarray(ref[2], dtype=int), np.asarray(out[2], dtype=int), atol=1
    )


def test_window_fallback_on_pathological_indices():
    """Indices spanning more than any window within one tile must force
    the full-width kernel (win=0), never a window that misses taps."""
    from solex_ser_recon_en_tpu.ops.fused_pallas import _window_for_indices

    iw, ih = 384, 128
    ind = np.zeros((1, ih), dtype=np.int32)
    ind[0, ::2] = 2
    ind[0, 1::2] = iw - 2  # alternating edges inside every tile
    assert _window_for_indices(ind, iw, 128) == 0


def test_dispatcher_contract(rng):
    """shg_forward picks a backend-appropriate kernel and keeps the same
    contract either way (CPU: the XLA body; TPU: the Pallas kernel, whose
    disks may differ from the MXU dot by 1 LSB)."""
    frames, ind_l, left_w = _case(rng, 8, 32, 16, [0, 1])
    a = shg_forward(frames, ind_l, left_w)
    b = shg_forward_xla(frames, ind_l, left_w)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(
        np.asarray(a[2], dtype=int), np.asarray(b[2], dtype=int), atol=1
    )


def test_shg_forward_jittable(rng):
    """entry()'s contract: jit(shg_forward) must lower with tracer args on
    any backend (regression: np.asarray on a traced left_w)."""
    import jax

    frames, ind_l, left_w = _case(rng, 8, 32, 16, [0, 1])
    out = jax.jit(shg_forward)(frames, ind_l, left_w)
    ref = shg_forward(frames, ind_l, left_w)
    for x, y in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
