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
