"""rANS round-trip + compression-efficiency tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from ric_tpu.ops import rans


def make_tables(rng, n_tables=4, alphabet=8):
    counts = rng.integers(1, 1000, size=(n_tables, alphabet))
    return rans.normalize_freqs(counts), counts


def roundtrip(symbols, tids, active, freqs, L):
    tables = rans.build_tables(freqs)
    T = symbols.shape[0] // L
    grid_s = jnp.asarray(symbols.reshape(T, L))
    grid_t = jnp.asarray(tids.reshape(T, L))
    grid_a = jnp.asarray(active.reshape(T, L))
    states, emit, words = rans.encode(tables, grid_s, grid_t, grid_a)
    # compact words lane-major (the stream layout): lane i's words
    # contiguous, preceded conceptually by per-lane counts
    emit_np = np.asarray(emit)
    words_np = np.asarray(words)
    counts = emit_np.sum(axis=0).astype(np.int32)
    lane_base = np.cumsum(counts) - counts
    stream16 = jnp.asarray(words_np.T[emit_np.T].astype(np.uint32))
    syms, xf, pos = rans.decode_section(
        tables, states, stream16, jnp.asarray(lane_base), grid_t, grid_a
    )
    np.testing.assert_array_equal(np.asarray(pos), lane_base + counts)
    # all lanes must return to the initial state
    np.testing.assert_array_equal(np.asarray(xf), rans.RANS_L)
    return np.asarray(syms).ravel(), int(emit_np.sum()) * 16


def test_rans_roundtrip_random(rng):
    L, T = 32, 64
    n = L * T
    freqs, counts = make_tables(rng)
    # sample symbols from each table's actual distribution
    tids = rng.integers(0, 4, size=n).astype(np.int32)
    probs = counts / counts.sum(axis=1, keepdims=True)
    symbols = np.array(
        [rng.choice(8, p=probs[t]) for t in tids], dtype=np.int32
    )
    active = rng.random(n) < 0.8
    symbols = np.where(active, symbols, 0).astype(np.int32)
    out, bits = roundtrip(symbols, tids, active.astype(bool), freqs, L)
    np.testing.assert_array_equal(out[active], symbols[active])
    assert (out[~active] == 0).all()


def test_rans_compression_near_entropy(rng):
    # Skewed binary source: ~0.1/0.9 -> entropy 0.469 bits/sym
    L, T = 64, 256
    n = L * T
    freqs = rans.normalize_freqs(np.array([[900, 100]]))
    symbols = (rng.random(n) < 0.1).astype(np.int32)
    tids = np.zeros(n, np.int32)
    active = np.ones(n, bool)
    out, bits = roundtrip(symbols, tids, active, freqs, L)
    np.testing.assert_array_equal(out, symbols)
    bits_per_sym = bits / n
    assert bits_per_sym < 0.52, f"rANS rate too high: {bits_per_sym:.3f}"


def test_rans_all_masked(rng):
    L = 16
    freqs = rans.normalize_freqs(np.array([[2048, 2048]]))
    symbols = np.zeros(L * 4, np.int32)
    tids = np.zeros(L * 4, np.int32)
    active = np.zeros(L * 4, bool)
    out, bits = roundtrip(symbols, tids, active, freqs, L)
    assert bits == 0


def test_divmod_by_freq_exact(rng):
    """The f32-reciprocal divide must equal true u32 divmod on every
    active-slot input: x1 < f << 20, f in [1, 4096] — including the
    adversarial near-multiple points where the float estimate is off by 1."""
    fs = np.concatenate([
        np.arange(1, 4097),
        rng.integers(1, 4097, size=4096),
    ]).astype(np.uint32)
    qs = np.concatenate([
        rng.integers(0, 1 << 20, size=fs.shape[0] // 2),
        np.full(fs.shape[0] - fs.shape[0] // 2, (1 << 20) - 1),
    ]).astype(np.uint64)
    for roff in (0, 1, -1):
        r_true = (roff % fs.astype(np.int64)).astype(np.uint64)
        x1 = qs * fs.astype(np.uint64) + r_true
        ok = x1 < (fs.astype(np.uint64) << np.uint64(20))
        x1, f = x1[ok].astype(np.uint32), fs[ok]
        q, r = rans._divmod_by_freq(jnp.asarray(x1), jnp.asarray(f))
        np.testing.assert_array_equal(np.asarray(q), x1 // f)
        np.testing.assert_array_equal(np.asarray(r), x1 % f)
