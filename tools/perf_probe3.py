"""Validate the block-prefetch decode design: outer loop over K-step
blocks with a bulk (K, L) window gather + inner scan doing dense row
selects. Variants: window gather inside the outer lax.scan body vs
python-unrolled outer loop (gather at jit top level)."""
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
T = 576
K = 8
NB = T // K


def main():
    rng = np.random.default_rng(0)
    tids = jnp.asarray(rng.integers(0, 64, size=(T, L)), jnp.int32)
    acts = jnp.ones((T, L), bool)
    stream = jnp.asarray(
        rng.integers(0, 65536, size=T * L // 4 + K), jnp.uint32)
    cum = jnp.asarray(rng.integers(0, 4096, size=(64, 32)), jnp.float32)
    comb = jnp.asarray(rng.integers(0, 1 << 24, size=(64, 32)), jnp.float32)
    n = stream.shape[0]

    cols = jnp.arange(64, dtype=jnp.int32)
    lanes32 = jnp.arange(32, dtype=jnp.int32)

    def dec_step(x, c, win, tid, act):
        """Full realistic decode step incl. table row fetch + window read."""
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
        rows_cum = jnp.dot(ohot, cum, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        rows_comb = jnp.dot(ohot, comb, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        slot = (x & jnp.uint32(4095)).astype(jnp.int32)
        slot_f = slot.astype(jnp.float32)
        sym = jnp.sum((slot_f[:, None] >= rows_cum), axis=1).astype(jnp.int32)
        oh_sym = (sym[:, None] == lanes32[None, :]).astype(jnp.float32)
        both = jnp.sum(rows_comb * oh_sym, axis=1).astype(jnp.int32)
        f = jnp.where(act, (both % 4096).astype(jnp.uint32), 1)
        st = jnp.where(act, (both // 4096).astype(jnp.uint32), 0)
        xn = f * (x >> 12) + slot.astype(jnp.uint32) - st
        need = act & (xn < (1 << 16))
        # select row c (0..K-1) of the window per lane
        kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        w = jnp.sum(
            jnp.where(kk == c[None, :], win, jnp.uint32(0)), axis=0)
        xn = jnp.where(need, (xn << 16) | w, xn)
        x = jnp.where(act, xn, x)
        c = c + need.astype(jnp.int32)
        return x, c, jnp.where(act, sym, 0)

    def block_body(carry, blk):
        x, pos = carry
        tid_b, act_b = blk
        win = stream[jnp.clip(pos[None, :]
                              + jnp.arange(K, dtype=jnp.int32)[:, None],
                              0, n - 1)]
        c = jnp.zeros((L,), jnp.int32)
        syms = []
        for k in range(K):
            x, c, s = dec_step(x, c, win, tid_b[k], act_b[k])
            syms.append(s)
        return (x, pos + c), jnp.stack(syms)

    # variant 1: single outer lax.scan over blocks (window gather in-scan)
    def v1(tids, acts):
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
        tb = tids.reshape(NB, K, L)
        ab = acts.reshape(NB, K, L)
        (xf, pf), syms = jax.lax.scan(block_body, (x0, pos0), (tb, ab))
        return syms.reshape(T, L)

    timeit(f"v1 outer-scan blocks K={K} (full decode step)",
           jax.jit(v1), tids, acts)

    # variant 2: python-unrolled outer loop
    def v2(tids, acts):
        x = jnp.full((L,), 1 << 16, jnp.uint32)
        pos = jnp.arange(L, dtype=jnp.int32) * (T // 4)
        out = []
        for b in range(NB):
            (x, pos), syms = block_body(
                (x, pos), (tids[b * K:(b + 1) * K], acts[b * K:(b + 1) * K]))
            out.append(syms)
        return jnp.concatenate(out)

    timeit("v2 python-unrolled blocks", jax.jit(v2), tids, acts)

    # variant 3: inner steps ALSO a lax.scan (nested scan)
    def block_body3(carry, blk):
        x, pos = carry
        tid_b, act_b = blk
        win = stream[jnp.clip(pos[None, :]
                              + jnp.arange(K, dtype=jnp.int32)[:, None],
                              0, n - 1)]

        def inner(ic, inp):
            x, c = ic
            tid, act = inp
            x, c, s = dec_step(x, c, win, tid, act)
            return (x, c), s

        (x, c), syms = jax.lax.scan(
            inner, (x, jnp.zeros((L,), jnp.int32)), (tid_b, act_b))
        return (x, pos + c), syms

    def v3(tids, acts):
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
        tb = tids.reshape(NB, K, L)
        ab = acts.reshape(NB, K, L)
        (xf, pf), syms = jax.lax.scan(block_body3, (x0, pos0), (tb, ab))
        return syms.reshape(T, L)

    timeit("v3 nested scan", jax.jit(v3), tids, acts)

    # variant 4: v1 with bf16 byte-split matmuls instead of f32 HIGHEST
    cum_lo = jnp.asarray(np.asarray(cum) % 256, jnp.bfloat16)
    cum_hi = jnp.asarray(np.asarray(cum) // 256, jnp.bfloat16)

    def dec_step4(x, c, win, tid, act):
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.bfloat16)
        r_lo = jnp.dot(ohot, cum_lo, preferred_element_type=jnp.float32)
        r_hi = jnp.dot(ohot, cum_hi, preferred_element_type=jnp.float32)
        rows_cum = r_hi * 256 + r_lo
        slot = (x & jnp.uint32(4095)).astype(jnp.int32)
        slot_f = slot.astype(jnp.float32)
        sym = jnp.sum((slot_f[:, None] >= rows_cum), axis=1).astype(jnp.int32)
        xn = x * jnp.uint32(3) + sym.astype(jnp.uint32)
        need = act & (xn < (1 << 16))
        kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        w = jnp.sum(jnp.where(kk == c[None, :], win, jnp.uint32(0)), axis=0)
        xn = jnp.where(need, (xn << 16) | w, xn)
        x = jnp.where(act, xn, x)
        c = c + need.astype(jnp.int32)
        return x, c, jnp.where(act, sym, 0)

    def block_body4(carry, blk):
        x, pos = carry
        tid_b, act_b = blk
        win = stream[jnp.clip(pos[None, :]
                              + jnp.arange(K, dtype=jnp.int32)[:, None],
                              0, n - 1)]
        c = jnp.zeros((L,), jnp.int32)
        syms = []
        for k in range(K):
            x, c, s = dec_step4(x, c, win, tid_b[k], act_b[k])
            syms.append(s)
        return (x, pos + c), jnp.stack(syms)

    def v4(tids, acts):
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
        tb = tids.reshape(NB, K, L)
        ab = acts.reshape(NB, K, L)
        (xf, pf), syms = jax.lax.scan(block_body4, (x0, pos0), (tb, ab))
        return syms.reshape(T, L)

    timeit("v4 bf16 split matmul (1 table)", jax.jit(v4), tids, acts)


if __name__ == "__main__":
    main()
