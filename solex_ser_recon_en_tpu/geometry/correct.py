"""Geometric correction: ellipse fit -> circularisation warp.

reference: ellipse_to_circle.py:94-145 (correct_image) and :294-342
(ellipse_to_circle).  Matrix math on host (3x3, float64); the warp itself is
a device op (ops/warp.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.warp import warp_projective, warp_projective_u16, warp_to_u16
from .edges import get_edge_list
from .ellipse import get_correction_matrix, two_step

Circle = Tuple[float, float, float]
NO_CIRCLE: Circle = (-1, -1, -1)


@dataclass
class GeometryResult:
    image: np.ndarray          # corrected uint16 image
    circle: Circle             # (cx, cy, radius) or NO_CIRCLE
    ratio: float
    phi: float                 # radians
    borders: list              # [minx, miny, maxx, maxy] in corrected frame
    mat3: np.ndarray = None
    # diagnostics for the _ellipse_fit.png plot
    raw_edges: np.ndarray = None
    kept_edges: np.ndarray = None
    ellipse_pts: np.ndarray = None


def correction_geometry(
    shape: Tuple[int, int],
    phi: float,
    ratio: float,
    center: np.ndarray,
    height: float,
    log: Optional[Callable[[str], None]] = None,
) -> Tuple[Circle, np.ndarray, int, int]:
    """The pure-matrix half of correct_image: (circle, mat3, out_h, out_w).

    All tiny float64 host math (3x3 matrices, 4 corners) — lets callers who
    only need the corrected-frame geometry (the ellipse fit on a shift that
    produces no output image, pipeline/run.py) skip the warp and its device
    round trip entirely.  reference: ellipse_to_circle.py:94-111,119-145.
    """
    mat, theta = get_correction_matrix(phi, ratio)
    mat3 = np.zeros((3, 3))
    mat3[:2, :2] = mat
    mat3[2, 2] = 1.0
    h, w = shape
    corners = np.array([[0, 0], [0, h], [w, 0], [w, h]], dtype=np.float64)
    new_corners = (np.linalg.inv(mat) @ corners.T).T
    new_h = float(np.max(new_corners[:, 1]) - np.min(new_corners[:, 1]))
    new_w = float(np.max(new_corners[:, 0]) - np.min(new_corners[:, 0]))
    tx, ty = float(np.min(new_corners[:, 0])), float(np.min(new_corners[:, 1]))
    mat3 = mat3 @ np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]])

    new_center = (
        np.linalg.inv(mat) @ np.asarray(center, dtype=np.float64).T
    ).T - np.array([tx, ty])
    new_radius = height * np.sqrt(np.abs(ratio / np.linalg.det(mat)))
    if log is not None:
        np.set_printoptions(suppress=True)
        log("Y/X ratio : " + "{:.3f}".format(ratio))
        log("Tilt angle : " + "{:.3f}".format(math.degrees(phi)) + " degrees")
        log("Linear transform correction matrix : \n" + str(mat))
        log(
            "Disk position, radius : "
            + (
                (str(new_center) + ", " + "{:.3f}".format(new_radius))
                if height != -1.0
                else "UNKNOWN"
            )
        )
        log("Unrotation : " + "{:.3f}".format(math.degrees(theta)) + " degrees")
        np.set_printoptions(suppress=False)
    circle = (float(new_center[0]), float(new_center[1]), float(new_radius))
    return circle, mat3, int(math.ceil(new_h)), int(math.ceil(new_w))


#: escape hatch for A/B tests (tests/test_warp_fast.py) — when False the
#: pipeline always takes the general gather warp
FAST_WARP = True


def _use_fast_warp(mat3: np.ndarray) -> bool:
    """Gate for the gather-free separable warp (ops/warp_fast.py).

    TPU-only like the fused-recon auto-select (models/shg.py): the CPU
    interpret path is correct but slow, and keeping CPU/mesh test runs on
    the general warp preserves their bit-identity goldens."""
    import jax

    from ..ops.warp_fast import unit_y_row, window_for

    from ..utils.placement import host_pipeline, tpu_placement

    return (
        FAST_WARP
        and not host_pipeline()  # host mode warps on XLA:CPU (no Pallas)
        and tpu_placement()
        and unit_y_row(mat3)
        and window_for(mat3) > 0
    )


def correct_image(
    image,
    phi: float,
    ratio: float,
    center: np.ndarray,
    height: float,
    log: Optional[Callable[[str], None]] = None,
) -> Tuple[np.ndarray, Circle, np.ndarray]:
    """Circularise ``image`` given ellipse tilt/ratio.

    ``image`` is either float 0..1 (as the reference passes, divided by
    65536 — ellipse_to_circle.py:299, Solex_recon.py:123) or uint16, in
    which case the /65536 happens on device, saving a host float64 pass.

    reference: ellipse_to_circle.py:94-145 — builds the 3x3 inverse map from
    the 2x2 correction matrix, translates so nothing clips, warps with
    cval = image[0,0], and rescales the circle parameters.

    Returns (uint16 image, circle, mat3).
    """
    from ..utils.placement import host_ops

    circle, mat3, out_h, out_w = correction_geometry(
        image.shape, phi, ratio, center, height, log=log
    )
    integer_input = np.issubdtype(np.dtype(image.dtype), np.integer)
    cval = float(np.asarray(image[0, 0]))
    with host_ops():
        return (
            _warp_dispatch(image, mat3, out_h, out_w, cval, integer_input),
            circle,
            mat3,
        )


def _warp_dispatch(image, mat3, out_h, out_w, cval, integer_input):
    from ..utils.placement import host_pipeline

    if host_pipeline() and isinstance(image, np.ndarray):
        # full-host mode: the native kernel (or its numpy twin) keeps even
        # the warp off the accelerator (and off XLA:CPU dispatch overhead)
        from ..ops.warp import warp_host_u16

        if integer_input:
            if image.dtype != np.uint16:
                image = image.astype(np.float32) / 65536.0
            cv = cval / 65536.0
        else:
            cv = cval
        return warp_host_u16(image, mat3, out_h, out_w, cv)
    if integer_input:
        if _use_fast_warp(mat3):
            # gather-free separable kernel (ops/warp_fast.py): ~5x the
            # packed-pair path on v5e, <=2e-7 from it (sum order only)
            from ..ops.warp_fast import warp_unit_y_u16

            warped = warp_unit_y_u16(
                jnp.asarray(image).astype(jnp.uint16), mat3,
                out_h, out_w, cval=cval / 65536.0,
            )
        else:
            # uint16 sources take the packed-pair warp: half the gathers,
            # bit-identical output (ops/warp.py:warp_projective_u16)
            warped = warp_projective_u16(
                jnp.asarray(image).astype(jnp.uint16), jnp.asarray(mat3),
                out_h, out_w, cval=cval / 65536.0,
            )
    elif _use_fast_warp(mat3):
        from ..ops.warp_fast import warp_unit_y_f01

        warped = warp_unit_y_f01(image, mat3, out_h, out_w, cval=cval)
    else:
        warped = warp_projective(
            jnp.asarray(image).astype(jnp.float32), jnp.asarray(mat3),
            out_h, out_w, cval=cval,
        )
    return warp_to_u16(warped)  # device-resident; writers np.asarray it


def correct_images_batched(
    disks,
    phi: float,
    ratio: float,
    log: Optional[Callable[[str], None]] = None,
):
    """Circularise a stack of disks (K, ih, F) sharing one (phi, ratio).

    A Doppler sweep warps every requested shift with the same correction
    matrix (Solex_recon.py:120-123) — one vmapped device program instead of
    K sequential warps.  Returns (uint16 (K, H', W') device array, circle,
    mat3) with the same per-image semantics as correct_image(center=-1,
    height=-1).
    """
    import jax

    mat, theta = get_correction_matrix(phi, ratio)
    mat3 = np.zeros((3, 3))
    mat3[:2, :2] = mat
    mat3[2, 2] = 1.0
    if isinstance(disks, (list, tuple)):
        # host-mode callers pass a LIST of per-shift disks so no (K, H, W)
        # stack copy is ever materialised (uniform shapes by construction)
        k, (h, w) = len(disks), disks[0].shape
    else:
        k, h, w = disks.shape
    corners = np.array([[0, 0], [0, h], [w, 0], [w, h]], dtype=np.float64)
    new_corners = (np.linalg.inv(mat) @ corners.T).T
    new_h = float(np.max(new_corners[:, 1]) - np.min(new_corners[:, 1]))
    new_w = float(np.max(new_corners[:, 0]) - np.min(new_corners[:, 0]))
    tx, ty = float(np.min(new_corners[:, 0])), float(np.min(new_corners[:, 1]))
    mat3 = mat3 @ np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]])
    out_h, out_w = int(math.ceil(new_h)), int(math.ceil(new_w))

    from ..utils.placement import host_ops, host_pipeline

    if host_pipeline() and isinstance(disks, (np.ndarray, list, tuple)):
        # full-host mode: native warp kernel (numpy-twin fallback), no
        # accelerator/XLA dispatch; each shift warps straight into its row
        # of one preallocated stack
        from ..io.native import native_warp_u16_batch
        from ..ops.warp import warp_host_u16

        ds = []
        for i in range(k):
            d = np.asarray(disks[i])
            if d.dtype != np.uint16:
                d = d.astype(np.uint16)
            ds.append(d)
        cvals = [float(d[0, 0]) / 65536.0 for d in ds]
        warped = np.empty((k, out_h, out_w), np.uint16)
        # one shared matrix -> the batched kernel computes the per-row
        # coordinates once for all K shifts (bit-identical to the
        # per-image kernel; per-image fallback when the lib is absent)
        if not native_warp_u16_batch(ds, mat3, out_h, out_w, cvals, warped):
            for i in range(k):
                warp_host_u16(ds[i], mat3, out_h, out_w,
                              cval=cvals[i], out=warped[i])
    else:
        with host_ops():
            dj = jnp.asarray(disks).astype(jnp.uint16)
            m3 = jnp.asarray(mat3)

            if _use_fast_warp(mat3):
                from ..ops.warp_fast import warp_unit_y_u16_batched

                warped = warp_to_u16(
                    warp_unit_y_u16_batched(dj, mat3, out_h, out_w,
                                            cval=None)
                )
            else:

                def one(img):
                    # packed-pair u16 warp (disks are always uint16 here)
                    return warp_to_u16(
                        warp_projective_u16(
                            img, m3, out_h, out_w,
                            cval=img[0, 0].astype(jnp.float32) / 65536.0,
                        )
                    )

                warped = jax.vmap(one)(dj)
    new_center = (np.linalg.inv(mat) @ np.array([-1.0, -1.0]).T).T - np.array([tx, ty])
    new_radius = -1.0 * np.sqrt(np.abs(ratio / np.linalg.det(mat)))
    if log is not None:
        np.set_printoptions(suppress=True)
        log("Y/X ratio : " + "{:.3f}".format(ratio))
        log("Tilt angle : " + "{:.3f}".format(math.degrees(phi)) + " degrees")
        log("Linear transform correction matrix : \n" + str(mat))
        log("Disk position, radius : UNKNOWN")
        log("Unrotation : " + "{:.3f}".format(math.degrees(theta)) + " degrees")
        np.set_printoptions(suppress=False)
    circle = (float(new_center[0]), float(new_center[1]), float(new_radius))
    return warped, circle, mat3


def ellipse_to_circle(
    image_u16: np.ndarray,
    log: Optional[Callable[[str], None]] = None,
    need_image: bool = True,
) -> GeometryResult:
    """Fit the limb ellipse on a disk image and circularise it.

    reference: ellipse_to_circle.py:294-342 — edges are found on a 4x
    block-mean downscale and scaled back; the ellipse fit gives (phi, ratio);
    the warp circularises; borders come from transforming the kept edge
    points into the corrected frame.

    ``need_image=False`` skips the warp (GeometryResult.image is None) —
    the hidden ellipse-fit shift usually produces no output product
    (Solex_recon.py:54-55,78), so only the tiny geometry is computed and a
    host-resident disk never crosses the accelerator link at all.
    """
    factor = 4
    h, w = image_u16.shape
    ph, pw = (-h) % factor, (-w) % factor
    if isinstance(image_u16, np.ndarray):
        # host-resident disk (host feed): block-mean downscale in numpy —
        # cheaper than shipping 8 MB over a slow link to downscale there.
        # Mean the uint16 directly (f64 accumulation) and scale the 16x
        # smaller result: bit-identical to mean(img/65536) (the 2^-16 scale
        # only shifts exponents) without a full-size float64 temporary
        img = image_u16
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw)))
        # exact u32 block sums then one power-of-two scale: bit-identical
        # to the f64 block mean (block sums < 2^24 are f64-exact; /16 and
        # /65536 are exact exponent shifts) at integer-sum speed
        small = img.reshape(
            (h + ph) // factor, factor, (w + pw) // factor, factor
        ).sum(axis=(1, 3), dtype=np.uint32).astype(np.float64) / (
            factor * factor * 65536.0
        )
    else:
        # device-resident disk: downscale there; only the small image comes
        # back to host for the point-set stages
        img_j = image_u16.astype(jnp.float32) / 65536.0
        if ph or pw:
            img_j = jnp.pad(img_j, ((0, ph), (0, pw)))
        small = np.asarray(
            img_j.reshape(
                (h + ph) // factor, factor, (w + pw) // factor, factor
            ).mean(axis=(1, 3)),
            dtype=np.float64,
        )
    X, raw_X = get_edge_list(small)
    X = X * factor
    raw_X = raw_X * factor
    center_yx, height, phi, ratio, X_f, ell_pts = two_step(X)
    center = np.array([center_yx[1], center_yx[0]])  # (x, y)

    if need_image:
        fixed, circle, mat3 = correct_image(
            image_u16, phi, ratio, center, height, log=log
        )
    else:
        fixed = None
        circle, mat3, _, _ = correction_geometry(
            image_u16.shape, phi, ratio, center, height, log=log
        )

    # transform kept edge points into the corrected frame for the borders
    pts = np.ones((X_f.shape[0], 3))
    pts[:, 0] = X_f[:, 1]  # x
    pts[:, 1] = X_f[:, 0]  # y
    pts_t = (np.linalg.inv(mat3) @ pts.T).T
    borders = [
        float(np.min(pts_t[:, 0])),
        float(np.min(pts_t[:, 1])),
        float(np.max(pts_t[:, 0])),
        float(np.max(pts_t[:, 1])),
    ]
    return GeometryResult(
        image=fixed,
        circle=circle,
        ratio=float(ratio),
        phi=float(phi),
        borders=borders,
        mat3=mat3,
        raw_edges=raw_X,
        kept_edges=X_f,
        ellipse_pts=ell_pts * 1.0,
    )
