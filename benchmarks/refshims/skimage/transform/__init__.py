import numpy as np
from _load import load

_warp = load("solex_ser_recon_en_tpu/ops/warp_host.py", "_repo_warp_host")


class ProjectiveTransform:
    def __init__(self, matrix=None):
        self.params = np.asarray(matrix, dtype=np.float64)


def downscale_local_mean(image, factors):
    """skimage semantics: per-axis block mean, zero-padding ragged edges
    (the repo twin geometry/edges.downscale_local_mean is scalar-factor;
    the reference passes a (f, f) tuple, ellipse_to_circle.py:301)."""
    if np.isscalar(factors):
        fy = fx = int(factors)
    else:
        fy, fx = (int(f) for f in factors)
    h, w = image.shape
    ph, pw = (-h) % fy, (-w) % fx
    if ph or pw:
        image = np.pad(image, ((0, ph), (0, pw)), mode="constant")
    H, W = image.shape
    return image.reshape(H // fy, fy, W // fx, fx).mean(axis=(1, 3))


def warp(image, inverse_map, output_shape=None, cval=0.0, **kwargs):
    """skimage.transform.warp shim for the reference's projective use
    (ellipse_to_circle.py:112-115): float conversion (img_as_float), the
    transform used as the inverse map, four-tap bilinear, constant cval."""
    img = np.asarray(image)
    if img.dtype == np.uint16:
        img01 = img.astype(np.float32) / np.float32(65535.0)
    elif img.dtype == np.uint8:
        img01 = img.astype(np.float32) / np.float32(255.0)
    else:
        img01 = img.astype(np.float32)
    if output_shape is None:
        oh, ow = img.shape
    else:
        oh, ow = int(output_shape[0]), int(output_shape[1])
    mat3 = np.asarray(inverse_map.params, dtype=np.float64)
    out = _warp.warp_projective_host(img01, mat3, oh, ow, cval=float(cval))
    return out.astype(np.float64)
