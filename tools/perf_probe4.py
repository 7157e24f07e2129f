"""Isolate window-fetch strategies for the decode scan."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return out


L = 32768
K = 8
NB = 72


def main():
    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.integers(0, 65536, size=1 << 22), jnp.uint32)
    n = stream.shape[0]
    pos = jnp.asarray(np.sort(rng.integers(0, n - K, size=L)), jnp.int32)

    # a. flat 1D gather of K*L from precomputed idx input
    idx = (pos[:, None] + jnp.arange(K)[None, :]).ravel()
    g = jax.jit(lambda s, i: s[i])
    timeit("top-level flat gather 262K (idx input)", g, stream, idx)
    idx2 = jnp.asarray(rng.integers(0, n, size=K * L), jnp.int32)
    timeit("top-level flat gather 262K (random idx)", g, stream, idx2)
    idx3 = jnp.asarray(rng.integers(0, n, size=1 << 22), jnp.int32)
    timeit("top-level flat gather 4M (random idx)", g, stream, idx3)
    idx4 = jnp.asarray(rng.integers(0, n, size=1 << 20), jnp.int32)
    timeit("top-level flat gather 1M (random idx)", g, stream, idx4)

    # b. computed-idx gather (like v2)
    g2 = jax.jit(lambda s, p: s[jnp.clip(
        p[None, :] + jnp.arange(K, dtype=jnp.int32)[:, None], 0, n - 1)])
    timeit("top-level (K,L) broadcast-idx gather", g2, stream, pos)

    # c. vmapped dynamic_slice (sliced gather)
    g3 = jax.jit(lambda s, p: jax.vmap(
        lambda pp: jax.lax.dynamic_slice(s, (pp,), (K,)))(p))
    timeit("top-level vmap dynamic_slice (L,K)", g3, stream, pos)

    # d. same inside a 72-iter scan
    def v_in_scan(s, p):
        def body(pp, _):
            w = jax.vmap(lambda q: jax.lax.dynamic_slice(s, (q,), (K,)))(pp)
            return pp + (w[:, 0] & 1).astype(jnp.int32), w.sum(dtype=jnp.uint32)
        return jax.lax.scan(body, p, None, length=NB)[1]

    timeit("in-scan vmap dynamic_slice x72", jax.jit(v_in_scan), stream, pos)

    def v_in_scan2(s, p):
        def body(pp, _):
            i = pp[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            w = s[jnp.clip(i, 0, n - 1)]
            return pp + (w[:, 0] & 1).astype(jnp.int32), w.sum(dtype=jnp.uint32)
        return jax.lax.scan(body, p, None, length=NB)[1]

    timeit("in-scan broadcast-idx gather x72", jax.jit(v_in_scan2), stream, pos)

    # e. staged-shift monotone expand, in a 576-step scan
    #    (placement of nw compact words to needing lanes)
    def expand(win, need):
        """win: (L,) compact words; need: (L,) bool. Returns w: (L,) where
        needing lane l gets win[rank(l)] (rank = # needing lanes before l)."""
        # d_j = target(j) - j; staged shifts, high bit first
        occ = jnp.arange(L, dtype=jnp.int32) < jnp.sum(need)
        val = win
        # remaining shift per slot: t_j - j where t_j = idx of j-th needing
        # lane. Compute t_j via: positions of needing lanes compacted —
        # that's itself an expand... instead compute r_j iteratively:
        # r at slot j = (number of non-needing lanes among first t_j) —
        # equivalently via cumsum on lanes: for each lane l, p_l = rank;
        # scatter l to slot p_l is the inverse problem. Use the dual:
        # shift values right; remaining shift tracked per slot, derived
        # from a cumsum of (1 - need):
        q = jnp.cumsum(1 - need.astype(jnp.int32))  # non-needing before/incl l
        # t_j solves: t - (q at t) ... skip exact math; emulate cost with
        # 15 stages of roll+select on 3 arrays
        rem = q  # stand-in with same shapes
        for b in range(14, -1, -1):
            d = 1 << b
            sval = jnp.roll(val, d)
            srem = jnp.roll(rem, d) - d
            socc = jnp.roll(occ, d)
            take = socc & (srem >= 0) & (jnp.roll(rem, d) >= d)
            val = jnp.where(take, sval, val)
            rem = jnp.where(take, srem, rem)
            occ = occ | take
        return val

    tids = jnp.asarray(rng.integers(0, 64, size=(576, L)), jnp.int32)

    def v_expand(tids):
        def step(carry, tid):
            x, gpos = carry
            xn = x * jnp.uint32(1664525) + tid.astype(jnp.uint32)
            need = xn < (1 << 20)
            win = jax.lax.dynamic_slice(stream, (gpos,), (L,))
            w = expand(win, need)
            xn = jnp.where(need, (xn << 16) | w, xn)
            return (xn, gpos + jnp.sum(need.astype(jnp.int32))), (x & 31)
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        return jax.lax.scan(step, (x0, jnp.int32(0)), tids)[1]

    timeit("in-scan dynslice+staged-expand x576", jax.jit(v_expand), tids)


if __name__ == "__main__":
    main()
