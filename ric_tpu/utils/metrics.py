"""Quality/rate metrics (reference image.cpp:248-265 psnr; SURVEY.md §5)."""
from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def bpp(nbytes: int, width: int, height: int) -> float:
    return nbytes * 8.0 / (width * height)
