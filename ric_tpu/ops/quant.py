"""TSUQ deadzone quantization + per-band weights + R/D thresholds.

TPU-native equivalent of reference lib/band.h:65-107 (TSUQ/TSUQi) and
lib/bandcodec.cpp:129-157 (makeThres/clen). Elementwise device ops; the
tiny per-band scalar tables are computed host-side in numpy.

One deliberate improvement over the reference: magnitude quantization uses
exact rounded division q = (2m + Q) // (2Q) instead of the truncated
reciprocal multiply (band.h:82) — identical for lossless (Q=1), and at most
one step different (slightly more accurate) elsewhere. Encoder and decoder
of this codec are self-consistent by construction.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ric_tpu.config import Transform, XI, BLK_SIZE


# --------------------------------------------------------------------------
# Per-band distortion weights (reference wavelet2d.cpp:1009-1032)
# --------------------------------------------------------------------------


def band_weights(transform: Transform, nlevels: int):
    """Weights per level (finest=0): dict level -> {D,H,V[,L]} weight.

    Scale s = XI^2 for cdf97, 2 otherwise. Finest: V=H=1, D=1/s; each
    coarser level multiplies by s; final L = s * V_coarsest.
    """
    s = XI * XI if transform == Transform.CDF97 else 2.0
    out = []
    for lvl in range(nlevels):
        w = {"V": s**lvl, "H": s**lvl, "D": s ** (lvl - 1)}
        if lvl == nlevels - 1:
            w["L"] = s ** (lvl + 1)
        out.append(w)
    return out


def band_quant(quant: int, weight: float) -> int:
    """Per-band quant step = trunc(quant / weight), min 1
    (reference bandcodec.cpp:244-246; float32 division as in C)."""
    q = int(np.float32(quant) / np.float32(weight))
    return max(q, 1)


def band_lambda(lam: int, weight: float) -> int:
    return int(np.float32(lam) / np.float32(weight))


# --------------------------------------------------------------------------
# R/D kill thresholds (reference bandcodec.cpp:129-157)
# --------------------------------------------------------------------------

# Cost-in-fifths-of-bits of coding one coefficient given block count
# (reference clen, bandcodec.cpp:135-147), and the enumerative
# pattern cost table blen (bandcodec.cpp:129-133).
_BLEN = np.array(
    [20, 40, 55, 66, 75, 81, 85, 88, 89, 88, 85, 81, 75, 66, 55, 40, 20],
    dtype=np.int64,
)
_CLEN_K = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2], np.int64)
_CLEN_LPS = np.array([3, 3, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1], np.int64)
_CLEN_MPS = np.array([1, 1, 2, 2, 2, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5], np.int64)


def _clen(coef: int, cnt: int) -> int:
    c = cnt - 1
    l = (coef - 1) >> int(_CLEN_K[c])
    return int((_CLEN_K[c] + 1 + l * _CLEN_LPS[c]) * 5 + _CLEN_MPS[c])


def rd_thresholds(quant: int, lam: int) -> np.ndarray:
    """The 16-entry threshold ladder of makeThres (bandcodec.cpp:149-157).

    Compared against s2u_ values (2|x|+sign), so ~2*quant means |x|~quant.
    """
    thres = np.empty(16, dtype=np.int64)
    for i in range(16):
        t = (quant + ((lam * (_BLEN[i + 1] - _BLEN[i] + _clen(1, i + 1)) + 8) >> 4)) & ~1
        t = min(t, 2 * quant)
        t = max(t, quant & ~1)
        thres[i] = t
    return thres.astype(np.int32)


# --------------------------------------------------------------------------
# Plain TSUQ (used for the LL band; reference band.h:65-107)
# --------------------------------------------------------------------------


def tsuq(x, quant: int):
    """Deadzone quantize: |x| <= quant//2 -> 0, else round(x/quant)."""
    if quant <= 1:
        return x
    t = quant >> 1
    dead = jnp.abs(x) <= t
    q = jnp.floor_divide(2 * x + quant, 2 * quant)
    return jnp.where(dead, 0, q)


def tsuq_inverse(q, quant: int):
    if quant <= 1:
        return q
    return q * quant
