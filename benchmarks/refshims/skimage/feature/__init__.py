"""skimage.feature.canny shim — a pure-numpy/scipy port of the repo's
canny kernel (ops/canny.py algorithm: gaussian blur with support-mask
normalisation, sobel, quantised-direction NMS, double threshold,
hysteresis).  Pure numpy so the reference's multiprocessing Pool workers
(Solex_recon.py:30) never touch jax — forking a jax-threaded parent
deadlocks.  reference call site: ellipse_to_circle.py:245-250 (binarised
blob outline; sub-pixel agreement is not load-bearing for the consumer's
outlier-robust ellipse fit)."""
import numpy as np
import scipy.ndimage as ndi


def _gaussian_kernel_1d(sigma):
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def canny(image, sigma=1.0, low_threshold=None, high_threshold=None):
    img = np.asarray(image, dtype=np.float32)
    k = _gaussian_kernel_1d(float(sigma))
    sm = ndi.convolve1d(ndi.convolve1d(img, k, axis=0, mode="constant"),
                        k, axis=1, mode="constant")
    norm = ndi.convolve1d(
        ndi.convolve1d(np.ones_like(img), k, axis=0, mode="constant"),
        k, axis=1, mode="constant")
    sm = sm / np.maximum(norm, 1e-12)

    gy = ndi.sobel(sm, axis=0, mode="reflect")
    gx = ndi.sobel(sm, axis=1, mode="reflect")
    mag = np.hypot(gy, gx)

    ang = np.arctan2(gy, gx)
    ang = np.where(ang < 0, ang + np.pi, ang)
    sector = (np.floor_divide(ang + np.pi / 8, np.pi / 4).astype(np.int32)) % 4

    pad = np.pad(mag, 1, mode="constant")

    def nb(dy, dx):
        return pad[1 + dy:1 + dy + mag.shape[0], 1 + dx:1 + dx + mag.shape[1]]

    neighbours = [
        (nb(0, 1), nb(0, -1)),
        (nb(1, 1), nb(-1, -1)),
        (nb(1, 0), nb(-1, 0)),
        (nb(1, -1), nb(-1, 1)),
    ]
    keep = np.zeros(mag.shape, bool)
    for s, (a, b) in enumerate(neighbours):
        keep |= (sector == s) & (mag >= a) & (mag >= b)
    border = np.zeros(mag.shape, bool)
    border[1:-1, 1:-1] = True
    keep &= border & (mag > 0)

    low = keep & (mag >= float(low_threshold))
    high = keep & (mag >= float(high_threshold))
    # hysteresis: strong edges propagated through the weak mask
    return ndi.binary_propagation(high, mask=low, structure=np.ones((3, 3)))
