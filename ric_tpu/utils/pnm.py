"""Minimal PNM (PGM/PPM) reader/writer — binary P5/P6 (8/16-bit).

Replaces the reference CLI's CImg dependency (ric.cpp:24-26) with a tiny
self-contained loader; imageio-style libraries are deliberately avoided.
"""
from __future__ import annotations

import numpy as np


def read_pnm(path: str) -> np.ndarray:
    """Returns (H, W) uint8/uint16 for P5 or (H, W, 3) for P6."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM file: {path}")
    color = data[:2] == b"P6"
    # parse header tokens, skipping comments
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    nch = 3 if color else 1
    arr = np.frombuffer(data, dt, count=w * h * nch, offset=i)
    arr = arr.astype(np.uint16 if maxval > 255 else np.uint8)
    return arr.reshape(h, w, 3) if color else arr.reshape(h, w)


def write_pnm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    color = img.ndim == 3
    maxval = 65535 if img.dtype.itemsize > 1 else 255
    magic = b"P6" if color else b"P5"
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n%d\n" % (w, h, maxval))
        if maxval > 255:
            f.write(img.astype(">u2").tobytes())
        else:
            f.write(img.astype(np.uint8).tobytes())
