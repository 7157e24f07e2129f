"""Halo-exchanged tiled DWT == single-device DWT, bit for bit
(SURVEY.md §4.4 metamorphic test; §7 hard part #4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ric_tpu.config import Transform
from ric_tpu.ops import lifting
from ric_tpu.parallel import halo_dwt

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

TRANSFORMS = [Transform.CDF97, Transform.CDF53, Transform.HAAR]


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _run_tiled(x, transform, levels, n_dev):
    h, w = x.shape
    mesh = _mesh(n_dev)

    def local(xt):
        pyr = halo_dwt.dwt_tiled(xt, transform, levels, w, "sp")
        flat = []
        for entry in pyr:
            for key in ("D", "H", "V", "L"):
                if key in entry:
                    flat.append(entry[key])
        return tuple(flat)

    nouts = len(lifting.level_dims(w, h, levels)) * 3 + 1
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sp"),),
        out_specs=tuple(P(None, "sp") for _ in range(nouts)),
    )
    return jax.jit(fn)(jnp.asarray(x))


def _run_tiled_roundtrip(x, transform, levels, n_dev):
    h, w = x.shape
    mesh = _mesh(n_dev)

    def local(xt):
        pyr = halo_dwt.dwt_tiled(xt, transform, levels, w, "sp")
        return halo_dwt.idwt_tiled(pyr, w, h, transform, "sp")

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(None, "sp"),),
        out_specs=P(None, "sp"),
    )
    return jax.jit(fn)(jnp.asarray(x))


@needs_8
@pytest.mark.parametrize("t", TRANSFORMS)
@pytest.mark.parametrize("n_dev", [4, 8])
def test_tiled_dwt_matches_global(rng, t, n_dev):
    h, w = 128, 512
    x = rng.integers(-2048, 2048, size=(h, w)).astype(np.int32)
    levels = 3
    ref = lifting.dwt(jnp.asarray(x), t, levels)
    got = _run_tiled(x, t, levels, n_dev)
    i = 0
    for lvl, entry in enumerate(ref):
        for key in ("D", "H", "V", "L"):
            if key in entry:
                np.testing.assert_array_equal(
                    np.asarray(got[i]), np.asarray(entry[key]),
                    err_msg=f"band {key}{lvl} t={t} n={n_dev}",
                )
                i += 1


@needs_8
@pytest.mark.parametrize("t", TRANSFORMS)
def test_tiled_roundtrip(rng, t):
    h, w = 64, 512
    x = rng.integers(-2048, 2048, size=(h, w)).astype(np.int32)
    y = _run_tiled_roundtrip(x, t, 3, 8)
    np.testing.assert_array_equal(np.asarray(y), x)


def _grid_mesh(spy, spx):
    devs = np.array(jax.devices()[: spy * spx]).reshape(spy, spx)
    return Mesh(devs, ("spy", "sp"))


def _run_grid(x, transform, levels, spy, spx, roundtrip):
    h, w = x.shape
    mesh = _grid_mesh(spy, spx)

    def local(xt):
        pyr = halo_dwt.dwt_tiled(
            xt, transform, levels, w, "sp", global_height=h, ax_y="spy"
        )
        if roundtrip:
            return halo_dwt.idwt_tiled(pyr, w, h, transform, "sp",
                                       ax_y="spy")
        flat = []
        for entry in pyr:
            for key in ("D", "H", "V", "L"):
                if key in entry:
                    flat.append(entry[key])
        return tuple(flat)

    if roundtrip:
        specs = P("spy", "sp")
    else:
        nouts = len(lifting.level_dims(w, h, levels)) * 3 + 1
        specs = tuple(P("spy", "sp") for _ in range(nouts))
    fn = shard_map(
        local, mesh=mesh, in_specs=(P("spy", "sp"),), out_specs=specs
    )
    return jax.jit(fn)(jnp.asarray(x))


@needs_8
@pytest.mark.parametrize("t", TRANSFORMS)
@pytest.mark.parametrize("grid", [(2, 4), (4, 2)])
def test_grid_dwt_matches_global(rng, t, grid):
    """2-D (spy, sp) tile grid: both axes halo-exchanged, bit-identical to
    the untiled transform (VERDICT round-1 item 4)."""
    spy, spx = grid
    h, w = 128, 256
    x = rng.integers(-2048, 2048, size=(h, w)).astype(np.int32)
    levels = 3
    ref = lifting.dwt(jnp.asarray(x), t, levels)
    got = _run_grid(x, t, levels, spy, spx, roundtrip=False)
    i = 0
    for lvl, entry in enumerate(ref):
        for key in ("D", "H", "V", "L"):
            if key in entry:
                np.testing.assert_array_equal(
                    np.asarray(got[i]), np.asarray(entry[key]),
                    err_msg=f"band {key}{lvl} t={t} grid={grid}",
                )
                i += 1


@needs_8
@pytest.mark.parametrize("t", TRANSFORMS)
def test_grid_roundtrip(rng, t):
    h, w = 128, 256
    x = rng.integers(-2048, 2048, size=(h, w)).astype(np.int32)
    y = _run_grid(x, t, 3, 2, 4, roundtrip=True)
    np.testing.assert_array_equal(np.asarray(y), x)
