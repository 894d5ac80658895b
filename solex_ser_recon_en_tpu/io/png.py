"""PNG (and general image) I/O for the final products.

The reference writes 16-bit PNGs with cv2.imwrite at compression 0
(solex_util.py:556-566).  We use cv2 when present (identical bytes semantics)
and fall back to PIL; both support 16-bit grayscale PNG.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

try:
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def write_png(path: str, img: np.ndarray, compression: int = 0) -> None:
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        img = np.clip(img, 0, 65535).astype(np.uint16)
    if _HAVE_CV2:
        cv2.imwrite(path, img, [cv2.IMWRITE_PNG_COMPRESSION, compression])
        return
    if _HAVE_PIL:
        mode = "I;16" if img.dtype == np.uint16 else "L"
        Image.fromarray(img, mode=mode).save(path)
        return
    raise RuntimeError("no PNG backend available (need cv2 or PIL)")


def read_image(path: str) -> np.ndarray:
    """Read PNG/TIF preserving bit depth, grayscale-converting if needed.

    reference: clahe_apply.py:244-246 (imread ANYDEPTH + BGR2GRAY).
    """
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
        if img is None:
            raise IOError(f"cannot read image {path}")
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img
    if _HAVE_PIL:
        img = np.asarray(Image.open(path))
        if img.ndim == 3:
            # PIL decodes RGB order: R gets the 0.299 weight
            dtype = img.dtype
            img = np.round(
                0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
            ).astype(dtype)
        return img
    raise RuntimeError("no image backend available (need cv2 or PIL)")
