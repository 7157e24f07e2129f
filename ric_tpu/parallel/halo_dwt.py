"""Globally-consistent tiled DWT via ppermute halo exchange.

The image is column-tiled over the mesh 'sp' axis; each lifting level
exchanges a fixed halo with its neighbors over ICI (jax.lax.ppermute) and
computes locally on the extended tile. Interior tile borders behave exactly
as interior image columns, so the distributed transform is **bit-identical**
to the single-device transform (SURVEY.md §7 hard part #4); only image
edges apply the reference's mirror boundary rules.

Correctness notes:
  * CDF 9/7 has 4 lifting steps; a wrong halo value contaminates one
    position per step, so a 4-column halo per side per level is exact.
  * At true image edges the halo is the reflection of the tile's own first
    columns; the reference's specialized end-steps (wavelet2d.cpp:325,
    341-358) are arithmetically equal to that reflection for the alpha,
    beta, delta steps. Only the gamma step differs (2*mult08(o) vs
    mult08(2*o)); it's applied via a position mask at global column 0.
  * Phases stay aligned because halos and tile widths are even.

Only the x axis is sharded (1-D sp mesh); the y transform is tile-local.
Requires: global width W = sp * W_local, W_local a multiple of 2^levels,
halo <= W_local >> (levels-1).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.config import Transform
from ric_tpu.ops import lifting
from ric_tpu.ops.lifting import _fwd97, _inv97, _fwd53, _inv53, _fwd_haar, _inv_haar

HALO = {Transform.CDF97: 4, Transform.CDF53: 2, Transform.HAAR: 0}


def _exchange(x, h, axis_name):
    """Halo exchange along the sharded last axis. Returns (left, right)
    halos of width h, with reflection padding at the global edges."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # from left neighbor: shift right (i -> i+1)
    left_recv = jax.lax.ppermute(
        x[..., -h:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    right_recv = jax.lax.ppermute(
        x[..., :h], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    mirror_left = jnp.flip(x[..., 1 : h + 1], axis=-1)
    mirror_right = jnp.flip(x[..., -h - 1 : -1], axis=-1)
    left = jnp.where(idx == 0, mirror_left, left_recv)
    right = jnp.where(idx == n - 1, mirror_right, right_recv)
    return left, right


def _fwd_x_tiled(x, transform: Transform, axis_name):
    """Sharded-axis 1-D forward lifting. x: (..., W_local). Returns (d, l)
    local phases, identical to the corresponding slice of the global
    transform."""
    h = HALO[Transform(transform)]
    w = x.shape[-1]
    if h == 0:  # haar: pairs are tile-local for even tile widths
        return lifting.fwd_lift_1d(x, transform)
    left, right = _exchange(x, h, axis_name)
    ext = jnp.concatenate([left, x, right], axis=-1)
    n_ext = ext.shape[-1]
    e, o = ext[..., 0::2], ext[..., 1::2]
    if Transform(transform) == Transform.CDF97:
        idx = jax.lax.axis_index(axis_name)
        ce_ext = (n_ext + 1) // 2
        lanepos = jnp.arange(ce_ext)
        mir = (lanepos == h // 2) & (idx == 0)
        d, l = _fwd97(e, o, n_ext, False, mir=mir)
    else:
        d, l = _fwd53(e, o, n_ext, False)
    hh = h // 2
    return d[..., hh : hh + (w + 1) // 2], l[..., hh : hh + w // 2]


def _inv_x_tiled(d, l, transform: Transform, axis_name):
    """Inverse of _fwd_x_tiled. d, l: local phases (w//2 each, w even)."""
    h = HALO[Transform(transform)]
    if h == 0:
        w = d.shape[-1] + l.shape[-1]
        return lifting.inv_lift_1d(d, l, w, transform)
    hh = h // 2
    dl_, dr_ = _exchange_phase(d, hh, axis_name, phase="even")
    ll_, lr_ = _exchange_phase(l, hh, axis_name, phase="odd")
    de = jnp.concatenate([dl_, d, dr_], axis=-1)
    le = jnp.concatenate([ll_, l, lr_], axis=-1)
    n_ext = de.shape[-1] + le.shape[-1]
    if Transform(transform) == Transform.CDF97:
        idx = jax.lax.axis_index(axis_name)
        lanepos = jnp.arange(de.shape[-1])
        mir = (lanepos == hh) & (idx == 0)
        e, o = _inv97(de, le, n_ext, False, mir=mir)
    else:
        e, o = _inv53(de, le, n_ext, False)
    w = d.shape[-1] + l.shape[-1]
    x = jnp.zeros(e.shape[:-1] + (n_ext,), e.dtype)
    x = x.at[..., 0::2].set(e)
    x = x.at[..., 1::2].set(o)
    return x[..., h : h + w]


def _exchange_phase(p, hh, axis_name, phase):
    """Halo exchange of a phase array with edge reflection.

    Reflection in the interleaved domain about global position 0 maps
    even-phase index k -> k and odd-phase index k -> k-1:
      x[-(2k)] = x[2k]; x[-(2k+1)] = x[2k-1].
    So the even (detail) phase mirrors without offset, the odd (lowpass)
    phase mirrors with a 1-element offset. At the right edge (even global
    width) reflection is about the last element, symmetric reasoning.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_recv = jax.lax.ppermute(
        p[..., -hh:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    right_recv = jax.lax.ppermute(
        p[..., :hh], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    if phase == "even":
        # x[-2m] = x[2m] -> e[-m] = e[m]
        mirror_left = jnp.flip(p[..., 1 : hh + 1], axis=-1)
        # right edge (W even): x[(n-1)+j] = x[(n-1)-j] -> e[ce+k] = e[ce-1-k]
        mirror_right = jnp.flip(p[..., -hh:], axis=-1)
    else:
        # x[-(2m-1)] = x[2m-1] -> o[-m] = o[m-1]
        mirror_left = jnp.flip(p[..., 0:hh], axis=-1)
        # o[fo+k] = o[fo-2-k]
        mirror_right = jnp.flip(p[..., -hh - 1 : -1], axis=-1)
    left = jnp.where(idx == 0, mirror_left, left_recv)
    right = jnp.where(idx == n - 1, mirror_right, right_recv)
    return left, right


def dwt2d_tiled(x, transform: Transform, axis_name):
    """One 2-D level on a column-sharded tile: sharded x then local y."""
    d, l = _fwd_x_tiled(x, transform, axis_name)
    D, V = lifting.fwd_lift_1d(d, transform, axis=-2)
    Hb, Lb = lifting.fwd_lift_1d(l, transform, axis=-2)
    return {"D": D, "H": Hb, "V": V, "L": Lb}


def idwt2d_tiled(bands, shape, transform: Transform, axis_name):
    H, _ = shape
    d = lifting.inv_lift_1d(bands["D"], bands["V"], H, transform, axis=-2)
    l = lifting.inv_lift_1d(bands["H"], bands["L"], H, transform, axis=-2)
    return _inv_x_tiled(d, l, transform, axis_name)


def dwt_tiled(x, transform: Transform, levels: int, global_width: int,
              axis_name):
    """Multi-level tiled DWT. x: local (H, W_local) int32. Level recursion
    follows the *global* dims (lifting.level_dims semantics)."""
    h = x.shape[-2]
    dims = lifting.level_dims(global_width, h, levels)
    pyramid = []
    cur = x.astype(jnp.int32)
    for i, (lh, lw) in enumerate(dims):
        bands = dwt2d_tiled(cur, transform, axis_name)
        entry = {"D": bands["D"], "H": bands["H"], "V": bands["V"]}
        if i == len(dims) - 1:
            entry["L"] = bands["L"]
        else:
            cur = bands["L"]
        pyramid.append(entry)
    return pyramid


def idwt_tiled(pyramid, global_width: int, height: int,
               transform: Transform, axis_name):
    dims = lifting.level_dims(global_width, height, len(pyramid))
    cur = pyramid[-1]["L"]
    for i in range(len(pyramid) - 1, -1, -1):
        bands = {
            "D": pyramid[i]["D"], "H": pyramid[i]["H"],
            "V": pyramid[i]["V"], "L": cur,
        }
        cur = idwt2d_tiled(bands, dims[i], transform, axis_name)
    return cur
