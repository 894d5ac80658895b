"""Optional live display of intermediate/final images.

reference: solex_util.py:99-110,136-143 (live disk build-up), :209-222
(mean image), :571-582 (final hconcat of clahe/HC/protus).  Display is a
debugging aid off the hot path ("will increase processing time
significantly", README.md:33-36); in headless environments every call is a
silent no-op.
"""

from __future__ import annotations

import numpy as np

_available = None


def _cv2_gui():
    global _available
    if _available is not None:
        return _available
    import os
    import sys

    # cv2's Qt backend ABORTS the process (uncatchable SIGABRT) when no
    # display server is reachable, so the probe below must never run
    # headless — check for a display first
    if sys.platform.startswith("linux") and not (
        os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
    ):
        _available = False
        return _available
    try:
        import cv2

        # headless builds raise on any GUI call
        cv2.namedWindow("_solex_probe", cv2.WINDOW_NORMAL)
        cv2.destroyWindow("_solex_probe")
        _available = cv2
    except Exception:
        _available = False
    return _available


def show(name: str, img: np.ndarray, wait_ms: int = 1) -> None:
    cv2 = _cv2_gui()
    if not cv2:
        return
    cv2.imshow(name, np.asarray(img))
    cv2.waitKey(wait_ms)


def show_products(cc, hc, protus, tempo_ms: int = 5000) -> None:
    """Final side-by-side view (reference solex_util.py:571-582)."""
    cv2 = _cv2_gui()
    if not cv2:
        return
    trio = cv2.hconcat([np.asarray(cc), np.asarray(hc), np.asarray(protus)])
    cv2.namedWindow("Sun images", cv2.WINDOW_NORMAL)
    cv2.imshow("Sun images", trio)
    cv2.waitKey(tempo_ms)
    cv2.destroyAllWindows()
