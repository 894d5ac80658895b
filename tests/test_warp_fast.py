"""Gather-free separable warp (ops/warp_fast.py) vs the general path.

The fast path must agree with ops/warp.py's four-tap evaluation to the
separable-sum-order ulp (<= ~2e-7 on [0, 1) data) across ratios, tilts,
translations and edge overhangs, and refuse matrices outside its
preconditions.  On CPU the kernel runs in interpret mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from solex_ser_recon_en_tpu.geometry.ellipse import get_correction_matrix
from solex_ser_recon_en_tpu.ops.warp import warp_projective, warp_projective_u16
from solex_ser_recon_en_tpu.ops.warp_fast import (
    unit_y_row,
    warp_unit_y_f01,
    warp_unit_y_u16,
    warp_unit_y_u16_batched,
    window_for,
)


def _pipeline_matrix(phi, ratio, tx, ty):
    mat, _ = get_correction_matrix(phi, ratio)
    m3 = np.zeros((3, 3))
    m3[:2, :2] = mat
    m3[2, 2] = 1.0
    return m3 @ np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]])


CASES = [
    # phi, ratio, tx, ty, h, w, out_h, out_w
    (0.15, 0.93, -13.4, 7.3, 300, 257, 310, 270),
    (-0.4, 1.18, 4.2, -9.7, 300, 257, 280, 300),
    (0.0, 1.0, 0.0, 0.0, 128, 128, 128, 128),
    (0.02, 0.78, 100.0, -0.0001, 200, 384, 260, 400),
    (1.2, 1.45, -60.0, 199.5, 220, 150, 230, 160),  # fully off the bottom
    (0.3, 0.9, -5.0, -250.0, 220, 150, 230, 160),   # fully off the top
]


@pytest.mark.parametrize("case", CASES)
def test_matches_packed_pair_warp(case, rng):
    phi, ratio, tx, ty, h, w, oh, ow = case
    m3 = _pipeline_matrix(phi, ratio, tx, ty)
    assert unit_y_row(m3)
    img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    ref = np.asarray(
        warp_projective_u16(jnp.asarray(img), jnp.asarray(m3), oh, ow,
                            cval=0.013)
    )
    fast = np.asarray(warp_unit_y_u16(img, m3, oh, ow, cval=0.013))
    np.testing.assert_allclose(fast, ref, atol=5e-7)


def test_identity_is_exact(rng):
    m3 = np.eye(3)
    img = rng.integers(0, 65536, (64, 128)).astype(np.uint16)
    out = np.asarray(warp_unit_y_u16(img, m3, 64, 128))
    np.testing.assert_array_equal(out, img.astype(np.float32) / 65536.0)


def test_f01_variant_matches_general(rng):
    m3 = _pipeline_matrix(0.2, 0.88, -3.0, 4.5)
    img = rng.random((100, 140)).astype(np.float32)
    ref = np.asarray(
        warp_projective(jnp.asarray(img), jnp.asarray(m3), 110, 150,
                        cval=0.25)
    )
    fast = np.asarray(warp_unit_y_f01(img, m3, 110, 150, cval=0.25))
    np.testing.assert_allclose(fast, ref, atol=5e-7)


def test_batched_per_image_cval(rng):
    m3 = _pipeline_matrix(0.3, 0.9, -5.0, 3.5)
    imgs = rng.integers(0, 65536, (3, 100, 256)).astype(np.uint16)
    fast = np.asarray(
        warp_unit_y_u16_batched(imgs, m3, 110, 270, cval=None)
    )
    for k in range(3):
        ref = np.asarray(
            warp_projective_u16(
                jnp.asarray(imgs[k]), jnp.asarray(m3), 110, 270,
                cval=float(imgs[k][0, 0]) / 65536.0,
            )
        )
        np.testing.assert_allclose(fast[k], ref, atol=5e-7)


def test_gate_rejects_non_unit_y_matrices():
    proj = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1e-4, 0.0, 1.0]])
    assert not unit_y_row(proj)
    scaled_y = np.array([[1.0, 0.0, 0.0], [0.0, 1.1, 0.0], [0.0, 0.0, 1.0]])
    assert not unit_y_row(scaled_y)
    assert unit_y_row(_pipeline_matrix(0.5, 1.3, 2.0, -3.0))


def test_extreme_scale_refused(rng):
    # |a| ~ 8: the per-tile source window would exceed the kernel cap
    m3 = np.array([[8.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    assert window_for(m3) == 0
    with pytest.raises(ValueError):
        warp_unit_y_u16(
            rng.integers(0, 65536, (64, 128)).astype(np.uint16), m3, 64, 128
        )


def test_pipeline_dispatch_gate_off_on_cpu():
    """On the CPU test backend the pipeline keeps the general warp
    (geometry/correct.py gates the fast path to TPU, like the fused
    recon auto-select).  Placement thread-locals are pinned explicitly:
    earlier tests in the same process may have run host-feed files,
    leaving host_pipeline() set on this thread (which the gate rightly
    honours — asserted below as its own case)."""
    import jax

    from solex_ser_recon_en_tpu.geometry.correct import _use_fast_warp
    from solex_ser_recon_en_tpu.utils.placement import (
        host_pipeline,
        set_host_pipeline,
    )

    m3 = _pipeline_matrix(0.15, 0.93, -13.4, 7.3)
    prev = host_pipeline()
    try:
        set_host_pipeline(False)
        expected = jax.default_backend() == "tpu"
        assert _use_fast_warp(m3) == expected
        assert not _use_fast_warp(np.array(
            [[1.0, 0.0, 0.0], [0.0, 1.1, 0.0], [0.0, 0.0, 1.0]]
        ))
        # host-pinned files must keep the general warp on any backend
        set_host_pipeline(True)
        assert not _use_fast_warp(m3)
    finally:
        set_host_pipeline(prev)
