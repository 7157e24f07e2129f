"""Unit tests: bit packing, enumerative pattern codes, phase-in codes."""
import numpy as np
import jax.numpy as jnp
import pytest

from ric_tpu.ops import bitpack, enumcode


def ref_pack_bits(vals, lens):
    """Slow reference: build the bit string LSB-first per field."""
    bits = []
    for v, l in zip(vals, lens):
        for i in range(l):
            bits.append((int(v) >> i) & 1)
    nwords = (len(bits) + 31) // 32
    words = np.zeros(nwords + 2, dtype=np.uint64)
    for pos, bit in enumerate(bits):
        words[pos // 32] |= np.uint64(bit) << np.uint64(pos % 32)
    return words.astype(np.uint32), len(bits)


def test_pack_unpack_random(rng):
    n = 5000
    lens = rng.integers(0, 33, size=n).astype(np.int32)
    vals = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    vals = vals & ((np.uint64(1) << lens.astype(np.uint64)) - 1).astype(np.uint32)
    cap = int(lens.sum()) // 32 + 2
    words, total = bitpack.pack(jnp.asarray(vals), jnp.asarray(lens), cap)
    ref_words, ref_total = ref_pack_bits(vals, lens)
    assert int(total) == ref_total
    nw = (ref_total + 31) // 32
    np.testing.assert_array_equal(np.asarray(words)[:nw], ref_words[:nw])
    # unpack round-trip
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    got = bitpack.unpack(words, jnp.asarray(offs), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(got), vals)


def test_pattern_rank_unrank_exhaustive_k():
    # All 2^16 patterns: rank must be a bijection onto [0, C(16,k)) per k.
    pats = np.arange(1 << 16, dtype=np.int32)
    ks = np.array([bin(p).count("1") for p in pats], dtype=np.int32)
    ranks = np.asarray(enumcode.pattern_rank(jnp.asarray(pats), jnp.asarray(ks)))
    from math import comb

    for k in range(17):
        sel = ranks[ks == k]
        assert sel.min() == 0 and sel.max() == comb(16, k) - 1
        assert len(np.unique(sel)) == comb(16, k)
    back = np.asarray(
        enumcode.pattern_unrank(jnp.asarray(ranks), jnp.asarray(ks))
    )
    np.testing.assert_array_equal(back, pats)


@pytest.mark.parametrize("n_values", [1, 2, 3, 16, 17, 31, 32, 1000, 12870])
def test_phase_in_roundtrip(n_values):
    L, th = enumcode.phase_in_params(n_values)
    v = jnp.arange(n_values, dtype=jnp.int32)
    hi, hi_len, ex, ex_len = enumcode.phase_in_encode(v, L, th)
    assert int(jnp.max(hi)) < (1 << L) if L else int(jnp.max(hi)) == 0
    back = enumcode.phase_in_decode(hi, ex, th)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))
    # average length must not exceed ceil(log2 N)
    import math

    avg = float(jnp.mean(L + ex_len.astype(jnp.float32)))
    assert avg <= math.ceil(math.log2(max(n_values, 2))) + 1e-6
