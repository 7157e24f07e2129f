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

Either axis (or both — a (spy, sp) grid mesh) can be sharded; the lifting
steps are axis-symmetric, so the y axis reuses the same halo machinery via
a moveaxis. Requires per sharded axis: global length N = s * N_local,
N_local a multiple of 2^levels, halo <= N_local >> (levels-1). Arbitrary
global sizes are handled one level up by tiling.pad_for_grid.
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


def _fwd_x_tiled(x, transform: Transform, axis_name, axis: int = -1):
    """Sharded-axis 1-D forward lifting along array `axis` (mesh axis
    `axis_name`). Returns (d, l) local phases, identical to the
    corresponding slice of the global transform."""
    if axis != -1:
        d, l = _fwd_x_tiled(
            jnp.moveaxis(x, axis, -1), transform, axis_name
        )
        return jnp.moveaxis(d, -1, axis), jnp.moveaxis(l, -1, axis)
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


def _inv_x_tiled(d, l, transform: Transform, axis_name, axis: int = -1):
    """Inverse of _fwd_x_tiled. d, l: local phases (w//2 each, w even)."""
    if axis != -1:
        x = _inv_x_tiled(
            jnp.moveaxis(d, axis, -1), jnp.moveaxis(l, axis, -1),
            transform, axis_name,
        )
        return jnp.moveaxis(x, -1, axis)
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


def dwt2d_tiled(x, transform: Transform, axis_name, ax_y=None):
    """One 2-D level on a grid-sharded tile: sharded x lifting, then y
    lifting (sharded over mesh axis `ax_y` when given, else tile-local)."""
    d, l = _fwd_x_tiled(x, transform, axis_name)
    if ax_y is None:
        D, V = lifting.fwd_lift_1d(d, transform, axis=-2)
        Hb, Lb = lifting.fwd_lift_1d(l, transform, axis=-2)
    else:
        D, V = _fwd_x_tiled(d, transform, ax_y, axis=-2)
        Hb, Lb = _fwd_x_tiled(l, transform, ax_y, axis=-2)
    return {"D": D, "H": Hb, "V": V, "L": Lb}


def idwt2d_tiled(bands, shape, transform: Transform, axis_name, ax_y=None):
    H, _ = shape
    if ax_y is None:
        d = lifting.inv_lift_1d(bands["D"], bands["V"], H, transform, axis=-2)
        l = lifting.inv_lift_1d(bands["H"], bands["L"], H, transform, axis=-2)
    else:
        d = _inv_x_tiled(bands["D"], bands["V"], transform, ax_y, axis=-2)
        l = _inv_x_tiled(bands["H"], bands["L"], transform, ax_y, axis=-2)
    return _inv_x_tiled(d, l, transform, axis_name)


def dwt_tiled(x, transform: Transform, levels: int, global_width: int,
              axis_name, global_height: int | None = None, ax_y=None):
    """Multi-level tiled DWT. x: local (H_local, W_local) int32. Level
    recursion follows the *global* dims (lifting.level_dims semantics).
    When `ax_y` names a mesh axis the y dimension is sharded over it too
    (2-D tile grid); `global_height` is then required."""
    h = global_height if ax_y is not None else x.shape[-2]
    dims = lifting.level_dims(global_width, h, levels)
    pyramid = []
    cur = x.astype(jnp.int32)
    for i, (lh, lw) in enumerate(dims):
        bands = dwt2d_tiled(cur, transform, axis_name, ax_y=ax_y)
        entry = {"D": bands["D"], "H": bands["H"], "V": bands["V"]}
        if i == len(dims) - 1:
            entry["L"] = bands["L"]
        else:
            cur = bands["L"]
        pyramid.append(entry)
    return pyramid


def idwt_tiled(pyramid, global_width: int, height: int,
               transform: Transform, axis_name, ax_y=None):
    dims = lifting.level_dims(global_width, height, len(pyramid))
    cur = pyramid[-1]["L"]
    for i in range(len(pyramid) - 1, -1, -1):
        bands = {
            "D": pyramid[i]["D"], "H": pyramid[i]["H"],
            "V": pyramid[i]["V"], "L": cur,
        }
        cur = idwt2d_tiled(bands, dims[i], transform, axis_name, ax_y=ax_y)
    return cur
