"""v2 raster-order duplex rANS engine: round-trip property tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ric_tpu.ops import rans


def _random_tables(rng, ntab=8, alpha=32):
    counts = rng.integers(1, 100, size=(ntab, alpha)).astype(np.float64)
    freqs = rans.normalize_freqs(counts)
    return rans.enc_dec_tables(freqs)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("L", [64, 256])
def test_model_roundtrip(seed, L):
    rng = np.random.default_rng(seed)
    T = 13
    tables = _random_tables(rng)
    syms = jnp.asarray(rng.integers(0, 32, size=(T, L)), jnp.int32)
    tids = jnp.asarray(rng.integers(0, 8, size=(T, L)), jnp.int32)
    acts = jnp.asarray(rng.random((T, L)) < 0.8)

    packed = jax.vmap(
        lambda s, t, a: rans.enc_pack_model(tables, s, t, a)
    )(syms, tids, acts)
    states, emit, words = rans.encode_packed(packed)
    cap = T * L + L
    packedw, nw = rans.compact_words(emit, words, cap)
    stream = rans.unpack_words16(packedw)

    def dec(states, stream):
        x = states
        gpos = jnp.int32(0)
        out = []
        for t in range(T):
            sym, xn = rans.model_transition(tables, x, tids[t], acts[t])
            x, gpos = rans.renorm(xn, acts[t], stream, gpos)
            out.append(sym)
        return jnp.stack(out), x, gpos

    out, xf, gpos = jax.jit(dec)(states, stream)
    got = np.asarray(out)
    want = np.where(np.asarray(acts), np.asarray(syms), 0)
    assert np.array_equal(got, want)
    assert int(gpos) == int(nw)
    assert np.all(np.asarray(xf) == rans.RANS_L)


@pytest.mark.parametrize("seed", [0, 3])
def test_duplex_model_uniform_roundtrip(seed):
    """Fused steps: a model phase followed by a uniform phase whose width
    depends on the model symbol (the s+refinement structure)."""
    rng = np.random.default_rng(seed)
    T, L = 9, 128
    tables = _random_tables(rng)
    syms = jnp.asarray(rng.integers(0, 13, size=(T, L)), jnp.int32)
    tids = jnp.asarray(rng.integers(0, 8, size=(T, L)), jnp.int32)
    acts = jnp.asarray(rng.random((T, L)) < 0.7)
    widths = jnp.where(acts, jnp.asarray(syms) % 13, 0)
    vals_np = rng.integers(0, 1 << 12, size=(T, L)).astype(np.int64)
    vals_np &= (1 << np.asarray(widths)) - 1
    vals = jnp.asarray(vals_np, jnp.int32)

    pk_a = jax.vmap(
        lambda s, t, a: rans.enc_pack_model(tables, s, t, a)
    )(syms, tids, acts)
    pk_b = jax.vmap(rans.enc_pack_uniform)(vals, widths, acts)
    # interleave phases: (T, 2, L) -> (2T, L)
    packed = jnp.stack([pk_a, pk_b], axis=1).reshape(2 * T, L)
    states, emit, words = rans.encode_packed(packed)
    packedw, nw = rans.compact_words(emit, words, 2 * T * L + L)
    stream = rans.unpack_words16(packedw)

    def dec(states, stream):
        x = states
        gpos = jnp.int32(0)
        out_s, out_v = [], []
        for t in range(T):
            sym, xn = rans.model_transition(tables, x, tids[t], acts[t])
            x, gpos = rans.renorm(xn, acts[t], stream, gpos)
            w = jnp.where(acts[t], sym % 13, 0)
            v, xn = rans.uniform_transition(x, w, acts[t])
            x, gpos = rans.renorm(xn, acts[t] & (w > 0), stream, gpos)
            out_s.append(sym)
            out_v.append(v)
        return jnp.stack(out_s), jnp.stack(out_v), x

    out_s, out_v, xf = jax.jit(dec)(states, stream)
    want_s = np.where(np.asarray(acts), np.asarray(syms), 0)
    assert np.array_equal(np.asarray(out_s), want_s)
    want_v = np.where(np.asarray(acts) & (np.asarray(widths) > 0),
                      vals_np, 0)
    assert np.array_equal(np.asarray(out_v), want_v)
    assert np.all(np.asarray(xf) == rans.RANS_L)


def test_expand_words_exhaustive_small():
    rng = np.random.default_rng(7)
    for L in (8, 32, 128):
        for density in (0.0, 0.3, 0.7, 1.0):
            need = jnp.asarray(rng.random(L) < density)
            win = jnp.asarray(rng.integers(0, 1 << 16, size=L), jnp.uint32)
            w = np.asarray(jax.jit(rans.expand_words)(win, need))
            nd = np.asarray(need)
            p = np.cumsum(nd) - nd
            expect = np.asarray(win)[p.astype(int)]
            assert np.array_equal(w[nd], expect[nd])


def test_encode_packed_sparse_matches_dense(rng):
    """encode_packed_sparse must be byte-identical to encode_packed on
    sparse, dense, and all-inactive grids (incl. T not a chunk multiple)."""
    import jax.numpy as jnp
    from ric_tpu.ops import rans

    L = 32
    for T, p_act in ((37, 0.03), (64, 1.0), (21, 0.0), (129, 0.4)):
        act = rng.random((T, L)) < p_act
        # whole-row activity pattern like real section tails
        act[rng.random(T) < 0.5] = False
        f = rng.integers(1, 4096, size=(T, L)).astype(np.uint32)
        st = rng.integers(0, 4096 - 1, size=(T, L)).astype(np.uint32)
        st = np.minimum(st, 4096 - f)
        packed = np.where(act, 1 | (f << 1) | (st << 13), 0).astype(np.uint32)
        g = jnp.asarray(packed)
        s0, e0, w0 = rans.encode_packed(g)
        s1, e1, w1 = rans.encode_packed_sparse(g)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
        np.testing.assert_array_equal(
            np.where(np.asarray(e0), np.asarray(w0), 0),
            np.where(np.asarray(e1), np.asarray(w1), 0))


def test_scan_rows_sparse_matches_scan(rng):
    """scan_rows_sparse == lax.scan on a representative decode body
    (uniform_transition + renorm, masked-lane convention): pins the
    inactive-rows-are-identity-with-zero-outputs contract independently
    of the full-codec tests (ADVICE r2)."""
    import jax
    import jax.numpy as jnp
    from ric_tpu.ops import rans

    L = 16
    for T, p_act in ((53, 0.2), (24, 1.0), (11, 0.0)):
        act = rng.random((T, L)) < p_act
        act[rng.random(T) < 0.5] = False  # whole-row gaps like real tails
        width = np.where(act, rng.integers(1, 13, size=(T, L)), 0).astype(
            np.int32)
        stream = jnp.asarray(
            rng.integers(0, 1 << 16, size=(T * L + L,)), jnp.uint32)
        states0 = jnp.asarray(
            rng.integers(1 << 16, 1 << 32, size=(L,), dtype=np.int64
                         ).astype(np.uint32))

        def body(carry, inp):
            x, gpos = carry
            w_r, act_r = inp
            v, xn = rans.uniform_transition(x, w_r, act_r)
            x, gpos = rans.renorm(xn, act_r & (w_r > 0), stream, gpos)
            return (x, gpos), v

        xs = (jnp.asarray(width), jnp.asarray(act))
        carry0 = (states0, jnp.int32(0))
        (xr, gr), vr = jax.lax.scan(body, carry0, xs)
        (xs_, gs_), vs_ = rans.scan_rows_sparse(
            body, carry0, xs, jnp.asarray(act.any(axis=1)))
        np.testing.assert_array_equal(np.asarray(xr), np.asarray(xs_))
        assert int(gr) == int(gs_)
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(vs_))


@pytest.mark.parametrize("frac_rows,dens", [
    (0.03, 0.1), (0.1, 0.4), (0.5, 0.9), (1.0, 1.0)])
def test_compact_words_prefix_matches(frac_rows, dens):
    """compact_words_prefix must be byte-identical to compact_words on
    partitioned grids (emitting rows confined to a prefix) — it is the
    encoder's large-sparse-plane fast path (VERDICT r5 #4), gated purely
    on speed, never on format."""
    rng = np.random.default_rng(7)
    T, L = 96, 64  # n = 6144 slots, SEG | n
    K = max(1, int(T * frac_rows))
    emit = np.zeros((T, L), bool)
    emit[:K] = rng.random((K, L)) < dens
    words = rng.integers(0, 1 << 16, size=(T, L)).astype(np.uint32)
    cap = T * L + 64
    a, na = rans.compact_words(jnp.asarray(emit), jnp.asarray(words), cap)
    for cs in (256, 8, 3):  # single chunk, multi-chunk, ragged last chunk
        b, nb = rans.compact_words_prefix(
            jnp.asarray(emit), jnp.asarray(words), cap, jnp.int32(K),
            chunk_seg=cs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(na) == int(nb)
