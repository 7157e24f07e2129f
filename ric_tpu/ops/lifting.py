"""Reversible integer lifting DWT (CDF 9/7, CDF 5/3, Haar) — TPU-native.

Re-design of reference lib/wavelet2d.cpp. The reference walks interleaved
rows with a 6-line pipelined window (wavelet2d.cpp:407-492); here each
lifting step is a whole-array shifted add over the even/odd phase split —
the natural XLA/VPU formulation — applied along one axis at a time. The two
formulations compute identical integers (validated bit-for-bit against the
compiled reference oracle in tests/test_oracle.py).

Conventions (match wavelet2d.cpp:320-359 semantics):
  * After a 1-D transform of length n, DETAIL coefficients live at even
    indices (ceil(n/2) of them) and LOWPASS at odd indices (floor(n/2)).
  * Boundaries mirror the single available neighbor — expressed as
    specialized end-steps in the reference (e.g. wavelet2d.cpp:325,341-358),
    uniform masked selects here.
  * 2-D band split (wavelet2d.cpp:446-447): rows even/odd x cols even/odd ->
      (even,even)=D  (even,odd)=H  (odd,even)=V  (odd,odd)=L
    giving D:(ceil H/2, ceil W/2), H:(ceil,floor), V:(floor,ceil),
    L:(floor,floor) — the exact splits of wavelet2d.cpp:73-79.
  * All arithmetic is int32 (exactly invertible; TPU VPU native width). The
    reference's int16 bands can wrap at each assignment; `wrap=True`
    replicates that for golden comparison only.

Haar odd-dimension note: the reference never transforms the last odd
row/column (wavelet2d.cpp:771,802 — its lossless round-trip *fails* on odd
dims, see SURVEY.md §0). Here the lone tail element passes through to the
detail band unchanged, making Haar lossless at every size.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ric_tpu.config import Transform
from ric_tpu.utils.bits import mult08, wrap_int16


def _ceil2(n: int) -> int:
    return (n + 1) >> 1


def _maybe_wrap(x, wrap: bool):
    return wrap_int16(x) if wrap else x


def _even_nbrs(o, n: int):
    """(left, right) odd-phase neighbors of each even position, mirrored.

    Even position 2k has odd neighbors o[k-1] and o[k]; k=0 mirrors to o[0],
    and for odd n the last even position mirrors its right neighbor to o[-1].
    """
    ce, fo = _ceil2(n), n >> 1
    left = jnp.concatenate([o[..., :1], o[..., : ce - 1]], axis=-1)
    if ce > fo:
        right = jnp.concatenate([o, o[..., -1:]], axis=-1)
    else:
        right = o
    return left, right


def _odd_nbrs(e, n: int):
    """(left, right) even-phase neighbors of each odd position, mirrored.

    Odd position 2k+1 has even neighbors e[k] and e[k+1]; for even n the last
    odd position mirrors its right neighbor to e[-1].
    """
    ce, fo = _ceil2(n), n >> 1
    left = e[..., :fo]
    if ce == fo:
        right = jnp.concatenate([e[..., 1:], e[..., -1:]], axis=-1)
    else:
        right = e[..., 1 : fo + 1]
    return left, right


def _even_mirror_mask(n: int):
    """Boolean (ce,) mask of even positions whose neighbors are mirrored.

    Position 0 always; the last even position too when n is odd. Needed for
    the 9/7 gamma step, where the reference computes 2*mult08(o) at mirrors
    (wavelet2d.cpp:331,348) which differs from mult08(2*o) in its shift
    flooring.
    """
    ce = _ceil2(n)
    m = np.zeros((ce,), dtype=bool)
    m[0] = True
    if n & 1:
        m[-1] = True
    return jnp.asarray(m)


# ---------------------------------------------------------------------------
# 1-D forward/inverse lifting on the last axis. Input x: (..., n) int32.
# Returns (d, l) = detail (ceil(n/2)) and lowpass (floor(n/2)) phases.
# ---------------------------------------------------------------------------


def _fwd97(e, o, n, wrap, mir=None):
    if mir is None:
        mir = _even_mirror_mask(n)
    # S1 (alpha=-3/2): e -= t + t>>1, t = l + r      [wavelet2d.cpp:327-328]
    l, r = _even_nbrs(o, n)
    t = l + r
    e = _maybe_wrap(e - (t + (t >> 1)), wrap)
    # S2 (beta=-1/16): o -= (l + r) >> 4             [wavelet2d.cpp:329]
    l, r = _odd_nbrs(e, n)
    o = _maybe_wrap(o - ((l + r) >> 4), wrap)
    # S3 (gamma=4/5): e += mult08(l + r); mirrors use 2*mult08(o)
    l, r = _even_nbrs(o, n)
    e = _maybe_wrap(e + jnp.where(mir, 2 * mult08(l), mult08(l + r)), wrap)
    # S4 (delta=15/32): o += (t>>1) - (t>>5), t = l + r
    l, r = _odd_nbrs(e, n)
    t = l + r
    o = _maybe_wrap(o + ((t >> 1) - (t >> 5)), wrap)
    return e, o


def _inv97(e, o, n, wrap, mir=None):
    if mir is None:
        mir = _even_mirror_mask(n)
    l, r = _odd_nbrs(e, n)
    t = l + r
    o = _maybe_wrap(o - ((t >> 1) - (t >> 5)), wrap)
    l, r = _even_nbrs(o, n)
    e = _maybe_wrap(e - jnp.where(mir, 2 * mult08(l), mult08(l + r)), wrap)
    l, r = _odd_nbrs(e, n)
    o = _maybe_wrap(o + ((l + r) >> 4), wrap)
    l, r = _even_nbrs(o, n)
    t = l + r
    e = _maybe_wrap(e + (t + (t >> 1)), wrap)
    return e, o


def _fwd53(e, o, n, wrap):
    # P: e -= (l + r) >> 1                           [wavelet2d.cpp:598-603]
    l, r = _even_nbrs(o, n)
    e = _maybe_wrap(e - ((l + r) >> 1), wrap)
    # U: o += (l + r) >> 2
    l, r = _odd_nbrs(e, n)
    o = _maybe_wrap(o + ((l + r) >> 2), wrap)
    return e, o


def _inv53(e, o, n, wrap):
    l, r = _odd_nbrs(e, n)
    o = _maybe_wrap(o - ((l + r) >> 2), wrap)
    l, r = _even_nbrs(o, n)
    e = _maybe_wrap(e + ((l + r) >> 1), wrap)
    return e, o


def _fwd_haar(e, o, n, wrap):
    # Pairs (x[2k], x[2k+1]): d = e - o; l = o + d>>1 [wavelet2d.cpp:766-775]
    fo = n >> 1
    ep = e[..., :fo]
    d = _maybe_wrap(ep - o, wrap)
    l = _maybe_wrap(o + (d >> 1), wrap)
    if n & 1:
        d = jnp.concatenate([d, e[..., -1:]], axis=-1)
    return d, l


def _inv_haar(e, o, n, wrap):
    fo = n >> 1
    d = e[..., :fo]
    op = _maybe_wrap(o - (d >> 1), wrap)
    ep = _maybe_wrap(d + op, wrap)
    if n & 1:
        ep = jnp.concatenate([ep, e[..., -1:]], axis=-1)
    return ep, op


_FWD = {Transform.CDF97: _fwd97, Transform.CDF53: _fwd53, Transform.HAAR: _fwd_haar}
_INV = {Transform.CDF97: _inv97, Transform.CDF53: _inv53, Transform.HAAR: _inv_haar}


def fwd_lift_1d(x, transform: Transform, axis: int = -1, wrap: bool = False):
    """1-D forward lifting along `axis`. Returns (detail, lowpass)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    e, o = x[..., 0::2], x[..., 1::2]
    d, l = _FWD[Transform(transform)](e, o, n, wrap)
    return jnp.moveaxis(d, -1, axis), jnp.moveaxis(l, -1, axis)


def inv_lift_1d(d, l, n: int, transform: Transform, axis: int = -1, wrap: bool = False):
    """Inverse of fwd_lift_1d: reassemble the length-n axis."""
    d = jnp.moveaxis(d, axis, -1)
    l = jnp.moveaxis(l, axis, -1)
    e, o = _INV[Transform(transform)](d, l, n, wrap)
    ce, fo = _ceil2(n), n >> 1
    out_shape = e.shape[:-1] + (n,)
    x = jnp.zeros(out_shape, dtype=e.dtype)
    x = x.at[..., 0::2].set(e)
    x = x.at[..., 1::2].set(o)
    return jnp.moveaxis(x, -1, axis)


# ---------------------------------------------------------------------------
# 2-D single level and multi-level pyramid
# ---------------------------------------------------------------------------


def dwt2d(x, transform: Transform, wrap: bool = False):
    """One 2-D level: rows then columns (matches the reference's fused
    horizontal+vertical pipeline order, wavelet2d.cpp:407-492).

    x: (..., H, W) int32. Returns dict of bands D,H,V,L with reference dims.
    """
    dx, lx = fwd_lift_1d(x, transform, axis=-1, wrap=wrap)
    D, V = fwd_lift_1d(dx, transform, axis=-2, wrap=wrap)
    Hb, L = fwd_lift_1d(lx, transform, axis=-2, wrap=wrap)
    return {"D": D, "H": Hb, "V": V, "L": L}


def idwt2d(bands, shape, transform: Transform, wrap: bool = False):
    """Inverse of dwt2d. shape = (H, W) of the reconstructed level."""
    H, W = shape
    dx = inv_lift_1d(bands["D"], bands["V"], H, transform, axis=-2, wrap=wrap)
    lx = inv_lift_1d(bands["H"], bands["L"], H, transform, axis=-2, wrap=wrap)
    return inv_lift_1d(dx, lx, W, transform, axis=-1, wrap=wrap)


def level_dims(width: int, height: int, levels: int):
    """Per-level (H, W) input dims, finest first, applying the reference's
    recursion stop: level>1 and DimX>15 and DimY>15 (wavelet2d.cpp:76)."""
    dims = [(height, width)]
    h, w = height, width
    for lvl in range(levels, 1, -1):
        if w > 15 and h > 15:
            h, w = h >> 1, w >> 1
            dims.append((h, w))
        else:
            break
    return dims


def dwt(x, transform: Transform, levels: int, wrap: bool = False):
    """Multi-level 2-D DWT.

    Returns a pyramid: list (finest first) of {'D','H','V'} band dicts, and
    the final lowpass 'L' array appended as pyramid[-1]['L'].
    """
    h, w = x.shape[-2], x.shape[-1]
    dims = level_dims(w, h, levels)
    pyramid = []
    cur = x.astype(jnp.int32)
    for i, (lh, lw) in enumerate(dims):
        bands = dwt2d(cur, transform, wrap=wrap)
        entry = {"D": bands["D"], "H": bands["H"], "V": bands["V"]}
        if i == len(dims) - 1:
            entry["L"] = bands["L"]
        else:
            cur = bands["L"]
        pyramid.append(entry)
    return pyramid


def idwt(pyramid, width: int, height: int, transform: Transform, wrap: bool = False):
    """Inverse of dwt."""
    dims = level_dims(width, height, len(pyramid))
    cur = pyramid[-1]["L"]
    for i in range(len(pyramid) - 1, -1, -1):
        bands = {
            "D": pyramid[i]["D"],
            "H": pyramid[i]["H"],
            "V": pyramid[i]["V"],
            "L": cur,
        }
        cur = idwt2d(bands, dims[i], transform, wrap=wrap)
    return cur
