"""Measure TPU cost of compaction-primitive candidates.

Decides the encoder word-compaction design (ops/rans.compact_words):
  1. flat scatter of 40M u32 (current compact_words)  [baseline]
  2. windowed row scatter-add: (K,128) rows added at row ids
  3. windowed row gather: table[(K,) ids] -> (K,128)
  4. fused one-hot intra-segment compact (sum over i of seg*onehot)
  5. cumsum over (K,128) axis=0
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    T, L = 1222, 32768
    n = T * L                      # 40M slots
    frac = 0.12

    emit = jnp.asarray(rng.random(n) < frac)
    words = jnp.asarray(rng.integers(0, 1 << 16, n), jnp.uint32)
    cap = int(n * frac * 1.2)

    @jax.jit
    def flat_scatter(emit, words):
        e = emit.astype(jnp.int32)
        pos = jnp.cumsum(e) - e
        stream = jnp.zeros((cap,), jnp.uint32)
        return stream.at[jnp.where(emit, pos, cap)].set(words, mode="drop")

    t = timeit(flat_scatter, emit, words)
    print(f"1 flat scatter {n/1e6:.0f}M:      {t*1e3:8.1f} ms  "
          f"{t/n*1e9:6.2f} ns/elem")

    K = 626_000
    M = 40_000
    rows = jnp.asarray(rng.random((K, 128)), jnp.float32)
    ids = jnp.asarray(np.sort(rng.integers(0, M, K)), jnp.int32)

    @jax.jit
    def win_scatter_add(rows, ids):
        out = jnp.zeros((M, 128), jnp.float32)
        return out.at[ids].add(rows)

    t = timeit(win_scatter_add, rows, ids)
    print(f"2 row scatter-add {K/1e3:.0f}K x128: {t*1e3:8.1f} ms  "
          f"{t/K*1e9:6.1f} ns/row  {t/(K*128)*1e9:6.2f} ns/elem")

    table = jnp.asarray(rng.random((M, 128)), jnp.float32)
    gids = jnp.asarray(rng.integers(0, M, 72_000), jnp.int32)

    @jax.jit
    def win_gather(table, gids):
        return table[gids]

    t = timeit(win_gather, table, gids)
    print(f"3 row gather 72K x128:     {t*1e3:8.1f} ms  "
          f"{t/72e3*1e9:6.1f} ns/row")

    S = n // 128                    # segments
    seg = jnp.asarray(rng.random((S, 128)), jnp.float32)
    semit = jnp.asarray(rng.random((S, 128)) < frac)

    @jax.jit
    def onehot_compact(seg, semit):
        e = semit.astype(jnp.int32)
        rank = jnp.cumsum(e, axis=1) - e
        ar = jnp.arange(128, dtype=jnp.int32)
        oh = (rank[:, :, None] == ar[None, None, :]) & semit[:, :, None]
        return jnp.sum(seg[:, :, None] * oh.astype(jnp.float32), axis=1)

    t = timeit(onehot_compact, seg, semit)
    print(f"4 onehot compact {S/1e3:.0f}K segs: {t*1e3:8.1f} ms  "
          f"{t/n*1e9:6.2f} ns/slot")

    big = jnp.asarray(rng.random((K, 128)), jnp.float32)

    @jax.jit
    def do_cumsum(b):
        return jnp.cumsum(b, axis=0)

    t = timeit(do_cumsum, big)
    print(f"5 cumsum {K/1e3:.0f}K x128 axis0: {t*1e3:8.1f} ms")

    # 6: scatter-add at 16-bit-packed u32 granularity (int add, windows)
    rows_u = jnp.asarray(rng.integers(0, 1 << 16, (K, 64)), jnp.uint32)

    @jax.jit
    def win_scatter_add_u32(rows_u, ids):
        out = jnp.zeros((M, 64), jnp.uint32)
        return out.at[ids].add(rows_u)

    t = timeit(win_scatter_add_u32, rows_u, ids)
    print(f"6 row scatter-add u32 x64: {t*1e3:8.1f} ms  {t/K*1e9:6.1f} ns/row")


if __name__ == "__main__":
    main()
