"""Sound per-band coefficient magnitude bounds via interval arithmetic.

Mirrors the exact integer lifting steps of ops/lifting.py (reference
wavelet2d.cpp:320-359,593-764,766-855) step by step on [lo, hi] intervals.
The bounds decide the static refinement-slot split of the entropy layer
(ops/rans.py v2): a band whose refinement field can exceed 12 bits gets an
extra uniform phase in its s+refinement scan, one that can exceed 24 bits
gets two. Sound-but-conservative is fine — an over-wide bound only costs a
mostly-inactive extra phase, never correctness.
"""
from __future__ import annotations

from ric_tpu.config import Transform


def _mult08(a: int) -> int:
    a = a - (a >> 2)
    a = a + (a >> 4)
    return a + (a >> 8)


def _shr(lo: int, hi: int, s: int):
    """Interval of x >> s (arithmetic floor shift) over [lo, hi]."""
    return lo >> s, hi >> s


def _lift1d_97(e, o):
    """(e_iv, o_iv) input intervals -> (detail_iv, low_iv)."""
    elo, ehi = e
    olo, ohi = o
    # S1: e -= t + t>>1, t = l + r (odd neighbors)
    tlo, thi = 2 * olo, 2 * ohi
    slo, shi = tlo + (tlo >> 1), thi + (thi >> 1)
    elo, ehi = elo - shi, ehi - slo
    # S2: o -= (l + r) >> 4 (even neighbors)
    slo, shi = _shr(2 * elo, 2 * ehi, 4)
    olo, ohi = olo - shi, ohi - slo
    # S3: e += mult08(l + r) (or 2*mult08(o) at mirrors)
    cands = (
        _mult08(2 * olo), _mult08(2 * ohi),
        2 * _mult08(olo), 2 * _mult08(ohi),
    )
    elo, ehi = elo + min(cands), ehi + max(cands)
    # S4: o += (t>>1) - (t>>5), t = l + r
    tlo, thi = 2 * elo, 2 * ehi
    slo = (tlo >> 1) - (tlo >> 5)
    shi = (thi >> 1) - (thi >> 5)
    olo, ohi = olo + min(slo, shi), ohi + max(slo, shi)
    return (elo, ehi), (olo, ohi)


def _lift1d_53(e, o):
    elo, ehi = e
    olo, ohi = o
    slo, shi = _shr(2 * olo, 2 * ohi, 1)
    elo, ehi = elo - shi, ehi - slo
    slo, shi = _shr(2 * elo, 2 * ehi, 2)
    olo, ohi = olo + slo, ohi + shi
    return (elo, ehi), (olo, ohi)


def _lift1d_haar(e, o):
    elo, ehi = e
    olo, ohi = o
    dlo, dhi = elo - ohi, ehi - olo
    llo, lhi = olo + (dlo >> 1), ohi + (dhi >> 1)
    return (dlo, dhi), (llo, lhi)


_LIFT = {
    Transform.CDF97: _lift1d_97,
    Transform.CDF53: _lift1d_53,
    Transform.HAAR: _lift1d_haar,
}


def band_abs_bounds(transform: Transform, levels: int, input_hi: int):
    """Per-level {'D','H','V','L'} max-abs coefficient bounds for input
    samples in [-input_hi, input_hi]. Levels listed finest first (matching
    ops/lifting.dwt pyramid order)."""
    lift = _LIFT[Transform(transform)]
    iv = (-input_hi, input_hi)
    out = []
    for _ in range(levels):
        d_iv, l_iv = lift(iv, iv)           # rows
        dd, dv = lift(d_iv, d_iv)           # cols of row-detail
        hd, ll = lift(l_iv, l_iv)           # cols of row-low
        out.append({
            "D": max(-dd[0], dd[1]),
            "V": max(-dv[0], dv[1]),
            "H": max(-hd[0], hd[1]),
            "L": max(-ll[0], ll[1]),
        })
        iv = ll
    return out


def flen_bound(abs_bound: int, quant: int) -> int:
    """Max refinement+sign field length for coefficients bounded by
    abs_bound, quantized with step `quant` (mirrors blocks.quantize_blocks
    and image_codec._coeff_size_fields)."""
    u_max = 2 * abs_bound + 1
    mag_max = u_max >> 1
    if quant > 1:
        mag_max = (2 * mag_max + quant) // (2 * quant)
    mag1_max = max(mag_max - 1, 0)
    s_max = mag1_max.bit_length()
    return max(min(s_max, 30), 1)
