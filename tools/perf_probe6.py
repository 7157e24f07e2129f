"""Bisect the decode-step cost: which component burns the time."""
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
    print(f"{name:52s} {dt*1e3:9.3f} ms  ({dt/T*1e6:6.1f} us/step)")
    return out


L = 32768
T = 576
K = 8
NB = T // K


def main():
    rng = np.random.default_rng(0)
    tids = jnp.asarray(rng.integers(0, 64, size=(T, L)), jnp.int32)
    stream = jnp.asarray(
        rng.integers(0, 65536, size=T * L // 4 + K), jnp.uint32)
    cum = jnp.asarray(rng.integers(0, 4096, size=(64, 32)), jnp.float32)
    comb = jnp.asarray(rng.integers(0, 1 << 24, size=(64, 32)), jnp.float32)
    n = stream.shape[0]
    cols = jnp.arange(64, dtype=jnp.int32)
    lanes32 = jnp.arange(32, dtype=jnp.int32)

    def make(level):
        def dec_step(x, c, win, tid):
            slot = (x & jnp.uint32(4095)).astype(jnp.int32)
            if level >= 1:
                ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
                rows_cum = jnp.dot(ohot, cum,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
                sym = jnp.sum((slot.astype(jnp.float32)[:, None] >= rows_cum),
                              axis=1).astype(jnp.int32)
            else:
                sym = slot & 31
            if level >= 2:
                rows_comb = jnp.dot(ohot, comb,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                oh_sym = (sym[:, None] == lanes32[None, :]).astype(jnp.float32)
                both = jnp.sum(rows_comb * oh_sym, axis=1).astype(jnp.int32)
            else:
                both = sym * 4097
            if level >= 3:
                f = (both & 4095).astype(jnp.uint32)
                st = (both >> 12).astype(jnp.uint32)
            else:
                f = jnp.uint32(1) + sym.astype(jnp.uint32)
                st = jnp.uint32(0) * f
            xn = f * (x >> 12) + slot.astype(jnp.uint32) - st
            need = xn < (1 << 16)
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            w = jnp.sum(jnp.where(kk == c[:, None], win, jnp.uint32(0)),
                        axis=1)
            xn = jnp.where(need, (xn << 16) | w, xn)
            c = c + need.astype(jnp.int32)
            return xn, c, sym

        def block_body(carry, tid_b):
            x, pos = carry
            win = stream[jnp.clip(
                pos[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                0, n - 1)]
            c = jnp.zeros((L,), jnp.int32)
            syms = []
            for k in range(K):
                x, c, s = dec_step(x, c, win, tid_b[k])
                syms.append(s)
            return (x, pos + c), jnp.stack(syms)

        def v(tids):
            x0 = jnp.full((L,), 1 << 16, jnp.uint32)
            pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
            (xf, pf), syms = jax.lax.scan(
                block_body, (x0, pos0), tids.reshape(NB, K, L))
            return syms.reshape(T, L)
        return jax.jit(v)

    timeit("L0: arith + window select only", make(0), tids)
    timeit("L1: + cum matmul/sym", make(1), tids)
    timeit("L2: + comb matmul/select", make(2), tids)
    timeit("L3: + f/st extract", make(3), tids)


if __name__ == "__main__":
    main()
