"""Image / disparity file IO (pure numpy + PIL/cv2).

Spec: models/coreContinuous_IGEV/utils/frame_utils.py — PFM (:34-81),
.flo (:13-32, 85-114), KITTI 16-bit PNG (:124-127, /256 with 0 = invalid),
Sintel RGB-packed disparity + occlusion mask (:130-136), FallingThings
depth→disparity via camera intrinsics (:139-146), TartanAir npy depth
(disp = 80/depth, :149-153), Middlebury PFM + mask0nocc (:156-176).

A C++ fast path for the hot decoders (PFM) is provided by the native
module (native/; anystereo_tpu.data.native_io) and used transparently when
built.
"""

from __future__ import annotations

import json
import os
import re
from os.path import basename, splitext
from typing import Optional, Tuple, Union

import numpy as np


def read_pfm(path: str) -> np.ndarray:
    """Portable float map; returns [H, W] or [H, W, 3] float32 (row order
    flipped to top-down as the reference does)."""
    try:
        from anystereo_tpu.data import native_io

        if native_io.available():
            return native_io.read_pfm(path)
    except ImportError:
        pass
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).astype(np.float32)


def write_pfm(path: str, array: np.ndarray) -> None:
    assert array.ndim == 2 and splitext(path)[1] == ".pfm"
    h, w = array.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1\n")  # little-endian
        np.flipud(array).astype("<f4").tofile(f)


_FLO_MAGIC = 202021.25


def read_flo(path: str) -> Optional[np.ndarray]:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != _FLO_MAGIC:
            return None
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, uv: np.ndarray) -> None:
    assert uv.ndim == 3 and uv.shape[2] == 2
    h, w = uv.shape[:2]
    with open(path, "wb") as f:
        np.array([_FLO_MAGIC], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        uv.astype(np.float32).tofile(f)


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path))


def read_disp_kitti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """16-bit PNG / 256; zero = invalid (frame_utils.py:124-127)."""
    import cv2

    disp = cv2.imread(path, cv2.IMREAD_ANYDEPTH).astype(np.float32) / 256.0
    return disp, disp > 0.0


def read_disp_sintel(path: str) -> Tuple[np.ndarray, np.ndarray]:
    a = _imread(path).astype(np.float32)
    disp = a[..., 0] * 4 + a[..., 1] / 2**6 + a[..., 2] / 2**14
    mask = _imread(path.replace("disparities", "occlusions"))
    return disp, (mask == 0) & (disp > 0)


def read_disp_falling_things(path: str) -> Tuple[np.ndarray, np.ndarray]:
    a = _imread(path).astype(np.float32)
    with open(os.path.join(os.path.dirname(path), "_camera_settings.json")) as f:
        intr = json.load(f)
    fx = intr["camera_settings"][0]["intrinsic_settings"]["fx"]
    disp = (fx * 6.0 * 100) / a
    return disp, disp > 0


def read_disp_tartanair(path: str) -> Tuple[np.ndarray, np.ndarray]:
    depth = np.load(path)
    disp = 80.0 / depth
    return disp, disp > 0


def read_disp_middlebury(path: str):
    if basename(path) == "disp0GT.pfm":
        disp = read_pfm(path)
        nocc = _imread(path.replace("disp0GT.pfm", "mask0nocc.png")) == 255
        return disp, nocc
    if basename(path) == "disp0.pfm":
        disp = read_pfm(path)
        return disp, disp < 1e3
    raise ValueError(path)


def read_gen(path: str) -> Union[np.ndarray, list]:
    """Generic reader (frame_utils.py:185-199): images as uint8-ish arrays,
    .pfm disparities as [H, W] float32."""
    ext = splitext(path)[-1]
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return _imread(path)
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(path)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    return []
