"""Direct tests of the device Canny edge detector (ops/canny.py)."""

import numpy as np
import jax.numpy as jnp

from solex_ser_recon_en_tpu.ops.canny import canny


def _blob(h=120, w=140, r=40.0):
    ys, xs = np.mgrid[:h, :w]
    cy, cx = h / 2, w / 2
    inside = ((xs - cx) ** 2 + (ys - cy) ** 2) <= r * r
    return np.where(inside, 65000.0, 0.0).astype(np.float32), (cx, cy, r)


def test_canny_finds_circle_outline():
    img, (cx, cy, r) = _blob()
    edges = np.asarray(canny(jnp.asarray(img), sigma=2.0,
                             low_threshold=100.0, high_threshold=150.0))
    ys, xs = np.nonzero(edges)
    assert len(ys) > 50
    rad = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
    # every edge pixel sits within a few px of the true circle
    assert np.abs(rad - r).max() < 4.0
    # and the outline covers the full angular range
    ang = np.arctan2(ys - cy, xs - cx)
    hist, _ = np.histogram(ang, bins=12, range=(-np.pi, np.pi))
    assert (hist > 0).all()


def test_canny_thresholds_gate_edges():
    img, _ = _blob()
    lo = np.asarray(canny(jnp.asarray(img), 2.0, 10.0, 15.0))
    hi = np.asarray(canny(jnp.asarray(img), 2.0, 1e9, 2e9))
    assert lo.sum() > 0
    assert hi.sum() == 0  # nothing passes an impossible threshold


def test_canny_blank_image_no_edges():
    img = jnp.zeros((64, 64), jnp.float32)
    assert np.asarray(canny(img, 2.0, 0.1, 0.2)).sum() == 0


def test_canny_hysteresis_connects_weak_edges():
    """A gradient ramp edge whose magnitude straddles the low/high band is
    kept where connected to a strong section and dropped where isolated."""
    img = np.zeros((80, 120), np.float32)
    # vertical step edge with strong amplitude in the top half, weak below
    img[:40, 60:] = 1000.0
    img[40:, 60:] = 180.0
    edges = np.asarray(canny(jnp.asarray(img), 1.5,
                             low_threshold=20.0, high_threshold=120.0))
    col_band = edges[:, 55:66]
    top = col_band[5:35].sum()
    bottom = col_band[45:75].sum()
    assert top > 0
    # weak-but-connected section survives via hysteresis
    assert bottom > 0


def test_refshim_canny_matches_device_kernel():
    """The jax-free numpy canny (ops/canny_host.py — backs both the small-
    blob dispatch in geometry/edges and the refshims' skimage.feature)
    must agree with the device kernel on the binarised blobs it is fed."""
    import jax.numpy as jnp
    import numpy as np

    from solex_ser_recon_en_tpu.ops import canny_host as shim
    from solex_ser_recon_en_tpu.ops.canny import canny as dev_canny

    rng = np.random.default_rng(4)
    for _ in range(4):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        yy, xx = np.mgrid[:h, :w]
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        r = rng.uniform(8, min(h, w) / 3)
        blob = np.where((yy - cy) ** 2 + (xx - cx) ** 2 < r * r, 65000.0, 0.0)
        a = np.asarray(dev_canny(jnp.asarray(blob.astype(np.float32)),
                                 sigma=2.0, low_threshold=100.0,
                                 high_threshold=150.0))
        b = shim.canny(blob, sigma=2.0, low_threshold=100.0,
                       high_threshold=150.0)
        # same contract: outline pixels; allow tiny numeric edge differences
        assert (a ^ b).mean() < 0.002, (a.sum(), b.sum(), (a ^ b).sum())
