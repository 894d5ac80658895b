"""CPU baseline: a faithful numpy replica of the reference's hot path.

The reference itself (pure Python+NumPy+OpenCV) cannot run in this image
(FreeSimpleGUI/skimage/astropy/lsq-ellipse are absent), so the benchmark
denominator is this replica of its per-frame algorithm, written to the same
semantics it executes:

- streaming read with a 25-frame buffer (video_reader.py:94-109),
- per-frame rot90 + x256 upscale (video_reader.py:117-122),
- pass 1: uint64 mean + max accumulation frame loop (solex_util.py:174-188),
- line detect + cubic fit (solex_util.py:223-259, via cv2.blur/np.polyfit),
- pass 2: per-frame per-shift fancy-indexed gather-lerp loop
  (solex_util.py:113-144),
- CLAHE + percentile stretch products (solex_util.py:532-541, via cv2).

This is exactly the work the reference does per scan on the CPU; timing it
on the same input gives the honest speedup denominator.
"""

from __future__ import annotations

import time
from typing import List

import numpy as np

from ..io.ser import SerReader


class _StreamingReader:
    """25-frame-buffered frame iterator (video_reader.py:94-109 semantics)."""

    def __init__(self, path: str, buffer_size: int = 25):
        self._r = SerReader(path)
        self.ih, self.iw = self._r.ih, self._r.iw
        self.frame_count = self._r.frame_count
        self._buffer_size = buffer_size
        self._idx = 0
        self._buf = None
        self._buf_start = 0

    def has_frames(self) -> bool:
        return self._idx < self.frame_count

    def next_frame(self) -> np.ndarray:
        if self._buf is None or self._idx >= self._buf_start + self._buf.shape[0]:
            self._buf_start = self._idx
            n = min(self._buffer_size, self.frame_count - self._idx)
            raw = np.asarray(self._r.raw_frames(self._idx, n))
            self._buf = raw
        img = self._buf[self._idx - self._buf_start]
        self._idx += 1
        if self._r.flag_rotate:
            img = np.rot90(img)
        if self._r.header.pixel_depth == 8:
            img = np.asarray(img, dtype="uint16") * 256
        return img


def cpu_mean_max(path: str):
    rdr = _StreamingReader(path)
    acc = np.zeros((rdr.ih, rdr.iw), dtype="uint64")
    mx = np.zeros((rdr.ih, rdr.iw), dtype="uint16")
    while rdr.has_frames():
        img = rdr.next_frame()
        acc += img
        mx = np.maximum(mx, img)
    return (acc / rdr.frame_count).astype("uint16"), mx


def cpu_line_fit(mean_img: np.ndarray, max_img: np.ndarray):
    import cv2

    blur = cv2.blur(max_img, ksize=(5, 5))
    ymean = np.mean(blur, axis=1)
    th = np.median(ymean) / 5
    where = ymean > th
    y1 = int(np.argmax(where))
    y2 = int(mean_img.shape[0] - 1 - np.argmax(where[::-1]))
    clip = int((y2 - y1) * 0.05)
    y1 = min(mean_img.shape[0] - 1, y1 + clip)
    y2 = max(0, y2 - clip)
    bw_y = max(1, int((y2 - y1) * 0.01))
    blur2 = cv2.blur(mean_img, ksize=(25, bw_y))
    mins = 12 + np.argmin(blur2[:, 12:-12], axis=1)
    p = np.polyfit(np.arange(y1, y2), mins[y1:y2], 3)[::-1]
    curve = np.polynomial.polynomial.polyval(
        np.arange(mean_img.shape[0], dtype="d"), p
    )
    floor = np.floor(curve)
    return np.stack([floor, curve - floor], axis=1)


def cpu_recon(path: str, fit: np.ndarray, shifts: List[int]):
    """The reference hot loop (solex_util.py:113-144)."""
    rdr = _StreamingReader(path)
    ih, iw = rdr.ih, rdr.iw
    disks = [np.zeros((ih, rdr.frame_count), dtype="uint16") for _ in shifts]
    cols = []
    for s in shifts:
        ind_l = (fit[:, 0] + np.ones(ih) * s).astype(int)
        ind_l[ind_l < 0] = 0
        ind_l[ind_l > iw - 2] = iw - 2
        cols.append((ind_l, (ind_l + 1).astype(int)))
    lw = np.ones(ih) - fit[:, 1]
    rw = np.ones(ih) - lw
    rows = np.arange(ih)
    f = 0
    while rdr.has_frames():
        img = rdr.next_frame()
        for i in range(len(shifts)):
            ind_l, ind_r = cols[i]
            disks[i][:, f] = img[rows, ind_l] * lw + img[rows, ind_r] * rw
        f += 1
    return disks


def cpu_products(disk: np.ndarray):
    import cv2

    cl1 = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(disk)
    bright = np.percentile(disk, 99.9999)
    dark_c = np.percentile(cl1, 10)
    bright_c = np.max(cl1)
    cc = (65535.0 * (cl1 - dark_c) / max(bright_c - dark_c, 1)).clip(0, 65535)
    hc = (65535.0 * (disk - bright * 0.25) / max(bright * 0.75, 1)).clip(0, 65535)
    return cc.astype(np.uint16), hc.astype(np.uint16)


def cpu_pipeline(path: str, shifts: List[int]) -> float:
    """Run the replica end-to-end; returns elapsed seconds."""
    t0 = time.perf_counter()
    mean_img, max_img = cpu_mean_max(path)
    fit = cpu_line_fit(mean_img, max_img)
    disks = cpu_recon(path, fit, shifts)
    for d in disks:
        cpu_products(d)
    return time.perf_counter() - t0
