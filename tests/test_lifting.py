"""Lifting transform properties: exact invertibility at every size/parity.

Reference parity note: the reference's Haar fails lossless round-trip on odd
dims (SURVEY.md §0, wavelet2d.cpp:771,802); ours must pass everywhere.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ric_tpu.config import Transform
from ric_tpu.ops import lifting

TRANSFORMS = [Transform.CDF97, Transform.CDF53, Transform.HAAR]
SIZES_1D = [4, 5, 6, 7, 8, 15, 16, 17, 63, 64, 128, 509]


@pytest.mark.parametrize("t", TRANSFORMS)
@pytest.mark.parametrize("n", SIZES_1D)
def test_roundtrip_1d(rng, t, n):
    x = rng.integers(-2048, 2048, size=(3, n)).astype(np.int32)
    d, l = lifting.fwd_lift_1d(jnp.asarray(x), t)
    assert d.shape[-1] == (n + 1) // 2 and l.shape[-1] == n // 2
    y = lifting.inv_lift_1d(d, l, n, t)
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("t", TRANSFORMS)
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 33), (64, 48), (263, 509)])
def test_roundtrip_2d(rng, t, shape):
    x = rng.integers(-2048, 2048, size=shape).astype(np.int32)
    bands = lifting.dwt2d(jnp.asarray(x), t)
    h, w = shape
    assert bands["D"].shape == ((h + 1) // 2, (w + 1) // 2)
    assert bands["H"].shape == ((h + 1) // 2, w // 2)
    assert bands["V"].shape == (h // 2, (w + 1) // 2)
    assert bands["L"].shape == (h // 2, w // 2)
    y = lifting.idwt2d(bands, shape, t)
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("t", TRANSFORMS)
@pytest.mark.parametrize("shape", [(64, 64), (509, 263), (512, 512), (100, 200)])
@pytest.mark.parametrize("levels", [2, 5])
def test_roundtrip_multilevel(rng, t, shape, levels):
    x = rng.integers(-2048, 2048, size=shape).astype(np.int32)
    pyr = lifting.dwt(jnp.asarray(x), t, levels)
    y = lifting.idwt(pyr, shape[1], shape[0], t)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_level_dims_stop():
    # Recursion stops once dims <= 15 (reference wavelet2d.cpp:76).
    dims = lifting.level_dims(64, 64, 5)
    assert dims == [(64, 64), (32, 32), (16, 16), (8, 8)]
    assert lifting.level_dims(15, 64, 5) == [(64, 15)]
    dims = lifting.level_dims(512, 512, 5)
    assert len(dims) == 5


def test_wrap_mode_roundtrip(rng):
    # int16-compat mode must still round-trip (wrapping is shared by fwd/inv).
    x = rng.integers(-2048, 2048, size=(64, 64)).astype(np.int32)
    for t in TRANSFORMS:
        pyr = lifting.dwt(jnp.asarray(x), t, 3, wrap=True)
        y = lifting.idwt(pyr, 64, 64, t, wrap=True)
        np.testing.assert_array_equal(np.asarray(y), x)
