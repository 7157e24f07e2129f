"""Isolate compact_words cost at the 4096^2 q20 shape (VERDICT r5 #4).

Times the three stages of the raster compaction on a (T, L) emission grid
with q20-like sparsity, plus variants, to find the binding stage.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.ops import rans

T, L = 20624, 2048
CAP = T * L + 64
rng = np.random.default_rng(0)
# q20-like: ~2% of rows active (partitioned to the front), ~30% of slots
# in an active row emit
K = int(T * 0.02)
emit = np.zeros((T, L), bool)
emit[:K] = rng.random((K, L)) < 0.3
words = rng.integers(0, 1 << 16, size=(T, L)).astype(np.uint32)
emit_d = jnp.asarray(emit)
words_d = jnp.asarray(words)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


full = jax.jit(lambda e, w: rans.compact_words(e, w, CAP))


@jax.jit
def stages12(e, w):
    # stage 1+2 only (no scatter): reproduce compact_words up to `ext`
    e_ = e.ravel()
    w_ = jnp.where(e_, w.ravel(), 0)
    n = e_.shape[0]
    SEG = 128
    S = n // SEG
    e2 = e_.reshape(S, SEG).astype(jnp.int32)
    w2 = w_.reshape(S, SEG)
    k = jnp.sum(e2, axis=1)
    base = jnp.cumsum(k) - k
    rank = jnp.cumsum(e2, axis=1) - e2
    j = jnp.arange(SEG, dtype=jnp.int32)
    delta0 = jnp.where(e2 == 1, j[None, :] - rank, 0).astype(jnp.uint32)
    st = (w2 << 9) | (delta0 << 1) | e2.astype(jnp.uint32)

    def shl(a, d):
        return jnp.concatenate(
            [a[:, d:], jnp.zeros((S, d), a.dtype)], axis=1)

    for kbit in range(0, 7, 2):
        dig = jnp.where((st & 1) == 1, (st >> (1 + kbit)) & 3, 0)
        moved = jnp.where(dig == 0, st, 0)
        for m in (1, 2, 3):
            if (m << kbit) >= SEG:
                break
            sh = shl(st, m << kbit)
            dig_s = jnp.where((sh & 1) == 1, (sh >> (1 + kbit)) & 3, 0)
            inc = jnp.where(dig_s == m, sh - ((m << kbit) << 1), 0)
            moved = moved | inc
        st = moved
    wc = (st >> 9).astype(jnp.uint16)
    phi = (base % SEG).astype(jnp.int32)
    ext = jnp.concatenate([wc, jnp.zeros((S, SEG), jnp.uint16)], axis=1)
    for b in range(0, 7, 2):
        dig = ((phi >> b) & 3)[:, None]
        nxt = jnp.where(dig == 0, ext, 0)
        for m in (1, 2, 3):
            d = m << b
            if d >= 2 * SEG:
                break
            rolled = jnp.concatenate([ext[:, -d:], ext[:, :-d]], axis=1)
            nxt = nxt | jnp.where(dig == m, rolled, 0)
        ext = nxt
    return ext, base


t_full = timeit(full, emit_d, words_d)
t_12 = timeit(stages12, emit_d, words_d)
print(f"full compact_words: {t_full*1e3:8.1f} ms")
print(f"stages 1+2 only:    {t_12*1e3:8.1f} ms")
print(f"=> stage 3 scatter: {(t_full-t_12)*1e3:8.1f} ms  "
      f"(S={T*L//128} segment rows)")

pref = jax.jit(lambda e, w, k: rans.compact_words_prefix(e, w, CAP, k))
t_pref = timeit(pref, emit_d, words_d, jnp.int32(K))
print(f"prefix compact:     {t_pref*1e3:8.1f} ms  (K={K} rows)")
