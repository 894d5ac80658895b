"""Unified video access for SER and AVI scans.

reference: video_reader.py:10-126 — the reference wraps both container types
behind one streaming class; we expose chunked slab reads instead so the
pipeline can overlap host decode with device compute.

AVI support uses OpenCV's demuxer (as the reference does,
video_reader.py:68-80,111-113); it is import-gated so the package works
without cv2 for SER-only workloads.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from .ser import SerReader


class VideoReader:
    """Common interface: .ih/.iw/.frame_count/.read()/.chunks()."""

    ih: int
    iw: int
    frame_count: int
    Width: int
    Height: int
    pixel_depth: int

    def read(self, start: int = 0, count: int | None = None) -> np.ndarray:
        raise NotImplementedError

    def read_all(self) -> np.ndarray:
        return self.read(0, self.frame_count)

    def chunks(self, chunk: int) -> Iterator[Tuple[int, np.ndarray]]:
        for start in range(0, self.frame_count, chunk):
            n = min(chunk, self.frame_count - start)
            yield start, self.read(start, n)


class _SerVideo(VideoReader):
    def __init__(self, path: str):
        self._r = SerReader(path)
        self.ih, self.iw = self._r.ih, self._r.iw
        self.frame_count = self._r.frame_count
        self.Width, self.Height = self._r.Width, self._r.Height
        self.pixel_depth = self._r.pixel_depth

    def read(self, start: int = 0, count: int | None = None) -> np.ndarray:
        return self._r.read(start, count)


class _AviVideo(VideoReader):
    """AVI frames via OpenCV, grayscale-converted and forced to 8-bit depth
    (upscaled x256 to uint16), matching video_reader.py:68-80,111-122."""

    def __init__(self, path: str):
        import cv2  # gated import

        self._cv2 = cv2
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"cannot open AVI file {path}")
        self.Width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.Height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.pixel_depth = 8
        self._rotate = self.Width > self.Height
        self.ih = max(self.Width, self.Height)
        self.iw = min(self.Width, self.Height)
        self._pos = 0

    def read(self, start: int = 0, count: int | None = None) -> np.ndarray:
        cv2 = self._cv2
        if count is None:
            count = self.frame_count - start
        if start != self._pos:
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            self._pos = start
        out = np.empty((count, self.ih, self.iw), dtype=np.uint16)
        for i in range(count):
            ok, img = self._cap.read()
            if not ok:
                out = out[:i]
                break
            if img.ndim == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            if self._rotate:
                img = np.rot90(img)
            out[i] = img.astype(np.uint16) << 8
        self._pos = start + out.shape[0]
        return out


def open_video(path: str) -> VideoReader:
    """Open a SER or AVI scan (reference: video_reader.py:18-26)."""
    upper = path.upper()
    if upper.endswith(".SER"):
        return _SerVideo(path)
    if upper.endswith(".AVI"):
        return _AviVideo(path)
    raise ValueError(f"input file {path} is neither SER nor AVI")
