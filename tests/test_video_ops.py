"""Video op tests: subpel bank, OBMC window properties, motion search."""
import numpy as np
import jax.numpy as jnp

from ric_tpu.models import video


def test_subpel_integer_phase_identity(rng):
    x = rng.integers(-2048, 2048, size=(32, 32)).astype(np.int32)
    bank = video.subpel_bank(jnp.asarray(x))
    assert bank.shape == (4, 4, 32, 32)
    np.testing.assert_array_equal(np.asarray(bank[0, 0]), x)


def test_subpel_halfpel_of_constant(rng):
    x = np.full((16, 16), 100, np.int32)
    bank = np.asarray(video.subpel_bank(jnp.asarray(x)))
    # interpolation of a constant is the constant (kernels sum to 64/16/64)
    assert (bank == 100).all()


def test_obmc_window_partition():
    # the 4 overlapping windows must sum to 16 everywhere
    w = video.W16
    s = (w[8:, 8:] + w[8:, :8] + w[:8, 8:] + w[:8, :8])
    assert (s == 16).all()


def test_obmc_zero_motion_identity(rng):
    x = rng.integers(-2048, 2048, size=(32, 40)).astype(np.int32)
    bank = video.subpel_bank(jnp.asarray(x))
    gy, gx = 4, 5
    mv0 = jnp.zeros((gy, gx), jnp.int32)
    intra = jnp.zeros((gy, gx), bool)
    pred = np.asarray(video.obmc_predict(bank, mv0, mv0, intra, 32, 40))
    np.testing.assert_array_equal(pred, x)


def test_obmc_uniform_shift(rng):
    # constant integer-pel motion reproduces the shifted reference (interior)
    x = rng.integers(-500, 500, size=(40, 40)).astype(np.int32)
    bank = video.subpel_bank(jnp.asarray(x))
    gy = gx = 5
    mvx = jnp.full((gy, gx), 2 << 2, jnp.int32)  # +2 px in x
    mvy = jnp.zeros((gy, gx), jnp.int32)
    intra = jnp.zeros((gy, gx), bool)
    pred = np.asarray(video.obmc_predict(bank, mvy, mvx, intra, 40, 40))
    np.testing.assert_array_equal(pred[:, :30], x[:, 2:32])


def test_motion_search_finds_global_shift(rng):
    # textured but correlated content (pure noise has no SAD gradient)
    yy, xx = np.mgrid[0:64, 0:64]
    ref = (200 * np.sin(xx / 3.0) * np.cos(yy / 5.0)
           + 100 * np.sin((xx + 2 * yy) / 7.0)).astype(np.int32)
    cur = np.roll(ref, (0, 3), axis=(0, 1))  # shift content right by 3
    bank = video.subpel_bank(jnp.asarray(ref))
    mvy, mvx, intra = video.motion_search(
        jnp.asarray(cur), jnp.asarray(ref), bank
    )
    # interior blocks should find mv = (-3, 0)*4 quarter-pel... cur[x] = ref[x-3]
    inner = np.asarray(mvx)[2:-2, 2:-2]
    assert (inner == -3 * 4).all(), inner
    assert not np.asarray(intra)[2:-2, 2:-2].any()
