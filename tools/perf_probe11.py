"""True costs via chained timing (output feeds next input, defeating any
async-timing artifacts) + correctness of the binary-pull expand."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

L = 32768
LOG_L = 15


def expand_words(win, need):
    """w[l] = win[p_l], p = exclusive cumsum of need. Gather-free binary
    pull: lag s_l = # of non-needing lanes before l; since s is monotone
    with 0/1 increments, pulling bit-by-bit (high->low) is exact."""
    s = jnp.cumsum(1 - need.astype(jnp.int32)) - (1 - need.astype(jnp.int32))
    cur = win
    for b in range(LOG_L - 1, -1, -1):
        d = 1 << b
        shifted = jnp.concatenate([cur[-d:], cur[:-d]])  # pull from l - d
        cur = jnp.where((s >> b) & 1 == 1, shifted, cur)
    return cur


def test_expand():
    rng = np.random.default_rng(1)
    for trial in range(20):
        need = rng.random(L) < rng.random()
        win = rng.integers(0, 1 << 16, size=L).astype(np.uint32)
        w = np.asarray(jax.jit(expand_words)(jnp.asarray(win),
                                             jnp.asarray(need)))
        p = np.cumsum(need) - need
        expect = win[p.astype(int)]
        ok = np.array_equal(w[need], expect[need])
        if not ok:
            print(f"trial {trial}: EXPAND MISMATCH")
            return False
    print("expand_words: 20 random trials exact")
    return True


def timeit_chain(name, step_fn, init, n_iter, reps=3):
    """Chained timing: x -> step(x) n_iter times inside one jit."""
    def chain(x):
        return jax.lax.fori_loop(0, n_iter, lambda i, x: step_fn(x), x)
    f = jax.jit(chain)
    out = f(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(out if not isinstance(out, tuple) else init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.3f} ms  ({dt/n_iter*1e6:7.2f} us/iter)")


def main():
    if not test_expand():
        return
    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.integers(0, 65536, size=(1 << 22) + L),
                         jnp.uint32)

    x0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, size=L), jnp.uint32)

    # 1. cumsum variants
    def s_cumsum(x):
        c = jnp.cumsum(x & 1)
        return x + c.astype(jnp.uint32)
    timeit_chain("in-loop jnp.cumsum(32768)", s_cumsum, x0, 200)

    def s_cumsum2d(x):
        v = (x & 1).astype(jnp.int32).reshape(256, 128)
        r = v
        for b in range(7):
            d = 1 << b
            r = r + jnp.concatenate(
                [jnp.zeros((256, d), jnp.int32), r[:, :-d]], axis=1)
        rows = r[:, -1]
        rt = rows
        for b in range(8):
            d = 1 << b
            rt = rt + jnp.concatenate([jnp.zeros((d,), jnp.int32), rt[:-d]])
        tot = (r + (rt - rows)[:, None]).reshape(-1)
        return x + tot.astype(jnp.uint32)
    timeit_chain("in-loop hierarchical 2D cumsum", s_cumsum2d, x0, 200)

    # 2. expand
    def s_expand(x):
        need = (x & 1) == 1
        win = jax.lax.dynamic_slice(stream, (jnp.int32(x[0] & 1023),), (L,))
        w = expand_words(win, need)
        return jnp.where(need, x ^ w, x + 1)
    timeit_chain("in-loop dynslice+expand(15 stages)", s_expand, x0, 200)

    # 3. one-hot row fetch f32 HIGHEST
    cum = jnp.asarray(rng.integers(0, 4096, size=(80, 32)), jnp.float32)
    cols = jnp.arange(80, dtype=jnp.int32)

    def s_rowfetch(x):
        tid = (x & 63).astype(jnp.int32)
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
        rows = jnp.dot(ohot, cum, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        slot = (x & jnp.uint32(4095)).astype(jnp.int32)
        sym = jnp.sum(slot.astype(jnp.float32)[:, None] >= rows, axis=1)
        return x + sym.astype(jnp.uint32)
    timeit_chain("in-loop one-hot rowfetch f32 (80x32)", s_rowfetch, x0, 200)

    # 3b. bf16 byte-split variant
    cum_np = np.asarray(cum)
    c_lo = jnp.asarray(cum_np % 256, jnp.bfloat16)
    c_hi = jnp.asarray(cum_np // 256, jnp.bfloat16)

    def s_rowfetch_bf16(x):
        tid = (x & 63).astype(jnp.int32)
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.bfloat16)
        rl = jnp.dot(ohot, c_lo, preferred_element_type=jnp.float32)
        rh = jnp.dot(ohot, c_hi, preferred_element_type=jnp.float32)
        rows = rh * 256 + rl
        slot = (x & jnp.uint32(4095)).astype(jnp.int32)
        sym = jnp.sum(slot.astype(jnp.float32)[:, None] >= rows, axis=1)
        return x + sym.astype(jnp.uint32)
    timeit_chain("in-loop rowfetch bf16 split (80x32)", s_rowfetch_bf16,
                 x0, 200)

    # 4. full decode-ish step: rowfetch x2 + arith + cumsum2d + expand
    comb = jnp.asarray(rng.integers(0, 1 << 24, size=(80, 32)), jnp.float32)
    l32 = jnp.arange(32, dtype=jnp.int32)

    def s_full(x):
        tid = (x & 63).astype(jnp.int32)
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
        rows = jnp.dot(ohot, cum, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        rows_c = jnp.dot(ohot, comb, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        slot = (x & jnp.uint32(4095)).astype(jnp.int32)
        sym = jnp.sum(slot.astype(jnp.float32)[:, None] >= rows,
                      axis=1).astype(jnp.int32)
        ohs = (sym[:, None] == l32[None, :]).astype(jnp.float32)
        both = jnp.sum(rows_c * ohs, axis=1).astype(jnp.int32)
        f = (both & 4095).astype(jnp.uint32)
        st = (both >> 12).astype(jnp.uint32)
        xn = f * (x >> 12) + slot.astype(jnp.uint32) - st
        need = xn < (1 << 16)
        win = jax.lax.dynamic_slice(stream, (jnp.int32(x[0] & 1023),), (L,))
        w = expand_words(win, need)
        xn = jnp.where(need, (xn << 16) | w, xn)
        return xn
    timeit_chain("in-loop FULL decode step", s_full, x0, 200)

    # 5. sort cost at A-stream scale
    kv = jnp.asarray(rng.integers(0, 1 << 24, size=1 << 24), jnp.int32)
    pay = jnp.asarray(rng.integers(0, 1 << 24, size=1 << 24), jnp.int32)
    f_sort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    out = f_sort(kv, pay)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f_sort(out[0], out[1])
    jax.block_until_ready(out)
    print(f"{'kv-sort 16.8M int32':52s} {(time.perf_counter()-t0)/3*1e3:9.3f} ms")

    # 6. scatter true cost (chained)
    idx = jnp.asarray(rng.integers(0, 1 << 22, size=1 << 21), jnp.int32)

    def s_scatter(x):
        w = jnp.zeros((1 << 22,), jnp.uint32).at[idx].add(x[: 1 << 21],
                                                          mode="drop")
        return x ^ w[: L].sum() ^ w
    xs0 = jnp.asarray(rng.integers(0, 100, size=1 << 22), jnp.uint32)
    timeit_chain("scatter-add 2.1M into 16MB (chained)", s_scatter, xs0, 5)

    # 7. big cumsum at A-stream scale (for offsets)
    big = jnp.asarray(rng.integers(0, 16, size=1 << 24), jnp.int32)

    def s_bigcumsum(x):
        return jnp.cumsum(x) & 0xFFFF
    timeit_chain("cumsum 16.8M (chained)", s_bigcumsum, big, 5)


if __name__ == "__main__":
    main()
