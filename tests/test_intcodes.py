"""Universal integer code round-trips (Rice, exp-Golomb, Fibonacci, taboo)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ric_tpu.ops import bitpack, intcodes


def pack_and_offsets(field, length, n):
    cap = int(jnp.sum(length)) // 32 + 2
    words, total = bitpack.pack(field, length, cap)
    offs = jnp.cumsum(length) - length
    return words, offs


@pytest.mark.parametrize("k", [0, 1, 3])
def test_rice_roundtrip(rng, k):
    # contract: quotient v>>k < 26
    v = jnp.asarray(rng.integers(0, 25 << k, 500), jnp.int32)
    f, l = intcodes.rice_encode(v, k)
    words, offs = pack_and_offsets(f, l, 500)
    got, ln = intcodes.rice_decode_at(words, offs, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))


@pytest.mark.parametrize("k", [0, 2])
def test_exp_golomb_roundtrip(rng, k):
    v = jnp.asarray(rng.integers(0, 30000, 500), jnp.int32)
    f, l = intcodes.exp_golomb_encode(v, k)
    words, offs = pack_and_offsets(f, l, 500)
    got, ln = intcodes.exp_golomb_decode_at(words, offs, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))


@pytest.mark.parametrize("k0,m", [(0, 0), (2, 1), (5, 0)])
def test_golomb_lin_roundtrip(rng, k0, m):
    v = jnp.asarray(
        np.concatenate([np.arange(40), rng.integers(0, 2000, 300)]), jnp.int32
    )
    f, l = intcodes.golomb_lin_encode(v, k0, m)
    assert int(jnp.max(l)) <= 32
    words, offs = pack_and_offsets(f, l, v.shape[0])
    got, ln = intcodes.golomb_lin_decode_at(words, offs, k0, m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))


def test_fibonacci_roundtrip(rng):
    v = jnp.asarray(
        np.concatenate([np.arange(50), rng.integers(0, 100000, 300)]),
        jnp.int32,
    )
    f, l = intcodes.fibonacci_encode(v)
    words, offs = pack_and_offsets(f, l, v.shape[0])
    got, ln = intcodes.fibonacci_decode_at(words, offs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))


def test_taboo_roundtrip(rng):
    v = jnp.asarray(
        np.concatenate([np.arange(30), rng.integers(0, 5000, 200)]), jnp.int32
    )
    f, l = intcodes.taboo_encode(v, n=2)
    words, offs = pack_and_offsets(f, l, v.shape[0])
    got, ln = intcodes.taboo_decode_at(words, offs, n=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))


def test_decode_stream_walk(rng):
    v = jnp.asarray(rng.integers(0, 1000, 64), jnp.int32)
    f, l = intcodes.fibonacci_encode(v)
    cap = int(jnp.sum(l)) // 32 + 2
    words, _ = bitpack.pack(f, l, cap)
    got = intcodes.decode_stream(words, 64, intcodes.fibonacci_decode_at)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
