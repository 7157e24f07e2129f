"""compact_by_mask / expand_by_mask: the packed-scan slot movers."""
import numpy as np
import jax.numpy as jnp

from ric_tpu.ops import rans


def test_compact_expand_random(rng):
    for trial in range(40):
        n = int(rng.integers(1, 4000))
        L = int(2 ** rng.integers(3, 9))
        p = float(rng.uniform(0.005, 1.0))
        mask = rng.random(n) < p
        vals = rng.integers(1, 1 << 31, n).astype(np.uint32)
        cap = (-(-n // 128)) * 128 + 128
        got, K = rans.compact_by_mask(
            jnp.asarray(vals), jnp.asarray(mask), cap)
        got = np.asarray(got)
        ref = vals[mask]
        assert int(K) == ref.size
        assert np.array_equal(got[: ref.size], ref), trial
        assert not got[ref.size :].any()

        T = -(-n // L)
        dense = np.zeros(T * L, np.uint32)
        dense[: ref.size] = ref
        back = rans.expand_by_mask(jnp.asarray(dense), jnp.asarray(mask), L)
        exp = np.zeros(n, np.uint32)
        exp[mask] = ref
        assert np.array_equal(np.asarray(back), exp), (trial, n, L, p)


def test_compact_empty_and_full(rng):
    n, L = 513, 16
    vals = rng.integers(1, 1 << 31, n).astype(np.uint32)
    for mask in (np.zeros(n, bool), np.ones(n, bool)):
        cap = (-(-n // 128)) * 128 + 128
        got, K = rans.compact_by_mask(
            jnp.asarray(vals), jnp.asarray(mask), cap)
        assert int(K) == int(mask.sum())
        assert np.array_equal(np.asarray(got)[: int(K)], vals[mask])
        T = -(-n // L)
        dense = np.zeros(T * L, np.uint32)
        dense[: int(K)] = vals[mask]
        back = rans.expand_by_mask(jnp.asarray(dense), jnp.asarray(mask), L)
        exp = np.zeros(n, np.uint32)
        exp[mask] = vals[mask]
        assert np.array_equal(np.asarray(back), exp)
