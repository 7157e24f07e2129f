"""Canonical Huffman VLC (ops/vlc.py) — the literal CHuffCodec capability
(reference huffcodec.{h,cpp}): length construction, canonical codes,
vectorized encode, LUT decode roundtrip."""
import numpy as np
import pytest

from ric_tpu.ops import vlc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lengths_kraft_and_optimality(rng, seed):
    r = np.random.default_rng(seed)
    freqs = np.where(r.random(24) < 0.2, 0, r.integers(1, 1000, 24))
    freqs[0] = 500  # ensure nonempty
    lens = vlc.make_lengths(freqs, max_len=15)
    active = freqs > 0
    assert (lens[~active] == 0).all()
    assert (lens[active] >= 1).all() and (lens[active] <= 15).all()
    kraft = np.sum(2.0 ** (-lens[active].astype(float)))
    assert kraft <= 1.0 + 1e-12
    # within ~3% + 1 bit/sym of the entropy bound (Huffman guarantee)
    p = freqs[active] / freqs[active].sum()
    ent = -(p * np.log2(p)).sum()
    avg = (p * lens[active]).sum()
    assert avg <= ent + 1.0 + 1e-9


def test_canonical_codes_prefix_free():
    lens = np.array([2, 3, 3, 2, 2, 0, 4, 4])
    codes = vlc.canonical_codes(lens)
    for i in range(len(lens)):
        for j in range(len(lens)):
            if i == j or lens[i] == 0 or lens[j] == 0:
                continue
            if lens[i] <= lens[j]:
                assert (codes[j] >> (lens[j] - lens[i])) != codes[i], (i, j)


@pytest.mark.parametrize("seed", [0, 5])
def test_vlc_roundtrip(rng, seed):
    r = np.random.default_rng(seed)
    freqs = r.integers(1, 500, 17)
    lens = vlc.make_lengths(freqs, max_len=12)
    codes = vlc.canonical_codes(lens)
    n = 5000
    syms = r.choice(17, size=n, p=freqs / freqs.sum())
    cap = (int(lens.max()) * n) // 32 + 4
    words, total = vlc.encode(syms, lens, codes, cap)
    out = vlc.decode_np(np.asarray(words), n, lens, codes)
    np.testing.assert_array_equal(out, syms)
    # rate sanity: within 12% of the empirical entropy (table-driven VLC)
    cnt = np.bincount(syms, minlength=17).astype(float)
    p = cnt / cnt.sum()
    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum()) * n
    assert int(total) <= max(ent * 1.12, ent + n)


def test_vlc_device_lanes_roundtrip(rng):
    """Lane-parallel device decode inverts encode_lanes for mixed-length
    code sets including >8-bit (second-stage) codes."""
    import jax.numpy as jnp

    from ric_tpu.ops import vlc

    for trial in range(4):
        nsym = int(rng.integers(5, 40))
        freqs = rng.zipf(1.5, nsym).astype(np.float64)
        lens = vlc.make_lengths(freqs, max_len=15)
        codes = vlc.canonical_codes(lens)
        alive = np.where(lens > 0)[0]
        n = int(rng.integers(50, 2000))
        syms = rng.choice(alive, size=n, p=freqs[alive] / freqs[alive].sum())
        L = int(2 ** rng.integers(2, 6))
        cap16 = 4 * n + 64
        init, stream, nw = vlc.encode_lanes(syms, lens, codes, L, cap16)
        out = vlc.decode_lanes(
            jnp.asarray(init, jnp.uint32),
            jnp.asarray(np.asarray(stream, np.uint32)),
            n, lens, codes, L)
        assert np.array_equal(np.asarray(out), syms), trial
