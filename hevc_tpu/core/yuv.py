"""Planar YUV 4:2:0 frame I/O and CTU-grid padding.

Behavioral counterpart: HM TLibVideoIO/TVideoIOYuv.cpp (read/write, pad);
padding extends edge samples so boundary CTUs encode the real content
(HM pads by replication; the reference CNN pads with zeros for the
predictor input, video_to_cu_depth.py:51-57 — both supported).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Frame:
    y: np.ndarray   # [H, W] uint8
    cb: np.ndarray  # [H/2, W/2] uint8
    cr: np.ndarray  # [H/2, W/2] uint8

    @property
    def width(self):
        return self.y.shape[1]

    @property
    def height(self):
        return self.y.shape[0]


def read_yuv420(path: str, width: int, height: int, n_frames: int = None,
                start: int = 0):
    """Read frames from a planar 8-bit YUV 4:2:0 file."""
    fsz = width * height * 3 // 2
    frames = []
    with open(path, "rb") as f:
        f.seek(start * fsz)
        i = 0
        while n_frames is None or i < n_frames:
            buf = f.read(fsz)
            if len(buf) < fsz:
                break
            arr = np.frombuffer(buf, np.uint8)
            y = arr[:width * height].reshape(height, width)
            cb = arr[width * height:width * height * 5 // 4].reshape(
                height // 2, width // 2)
            cr = arr[width * height * 5 // 4:].reshape(height // 2, width // 2)
            frames.append(Frame(y.copy(), cb.copy(), cr.copy()))
            i += 1
    return frames


def write_yuv420(path: str, frames, mode: str = "wb"):
    with open(path, mode) as f:
        for fr in frames:
            f.write(np.ascontiguousarray(fr.y, dtype=np.uint8).tobytes())
            f.write(np.ascontiguousarray(fr.cb, dtype=np.uint8).tobytes())
            f.write(np.ascontiguousarray(fr.cr, dtype=np.uint8).tobytes())


def pad_frame(frame: Frame, pad_w: int, pad_h: int, mode: str = "edge"):
    """Pad to the coding grid. mode: 'edge' (HM-style) or 'zero'
    (reference CNN input style)."""
    def pad(plane, tw, th):
        h, w = plane.shape
        if h == th and w == tw:
            return plane
        if mode == "edge":
            return np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")
        return np.pad(plane, ((0, th - h), (0, tw - w)))

    return Frame(pad(frame.y, pad_w, pad_h),
                 pad(frame.cb, pad_w // 2, pad_h // 2),
                 pad(frame.cr, pad_w // 2, pad_h // 2))


def crop_frame(frame: Frame, width: int, height: int):
    """Crop a (padded) reconstruction back to the conformance window —
    the decoder-output view of the picture (7.4.3.2.1)."""
    if frame.y.shape == (height, width):
        return frame
    return Frame(np.ascontiguousarray(frame.y[:height, :width]),
                 np.ascontiguousarray(frame.cb[:height // 2, :width // 2]),
                 np.ascontiguousarray(frame.cr[:height // 2, :width // 2]))


def extract_ctus(luma: np.ndarray, ctu: int = 64) -> np.ndarray:
    """[H, W] -> [nCTU, ctu, ctu] raster-ordered CTU batch (zero-padded)."""
    h, w = luma.shape
    th = -(-h // ctu) * ctu
    tw = -(-w // ctu) * ctu
    if (th, tw) != (h, w):
        luma = np.pad(luma, ((0, th - h), (0, tw - w)))
    g = luma.reshape(th // ctu, ctu, tw // ctu, ctu).transpose(0, 2, 1, 3)
    return g.reshape(-1, ctu, ctu)


def psnr(a: np.ndarray, b: np.ndarray, maxval: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.99
    return 10.0 * np.log10(maxval * maxval / mse)
