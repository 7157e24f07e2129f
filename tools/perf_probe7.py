"""Find the pathology in the block decode structure."""
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
    print(f"{name:56s} {dt*1e3:9.3f} ms")
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
    n = stream.shape[0]

    def make(barrier, sel, gather):
        def block_body(carry, tid_b):
            x, pos = carry
            if gather:
                win = stream[jnp.clip(
                    pos[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                    0, n - 1)]
                if barrier:
                    win = jax.lax.optimization_barrier(win)
            else:
                win = jnp.zeros((L, K), jnp.uint32)
            c = jnp.zeros((L,), jnp.int32)
            syms = []
            for k in range(K):
                xn = x * jnp.uint32(1664525) + tid_b[k].astype(jnp.uint32)
                need = xn < (1 << 20)
                if sel == "onehot":
                    kk = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                    w = jnp.sum(
                        jnp.where(kk == c[:, None], win, jnp.uint32(0)),
                        axis=1)
                elif sel == "fixed":
                    w = win[:, k]
                else:
                    w = jnp.uint32(0x1234)
                x = jnp.where(need, (xn << 16) | w, xn)
                c = c + need.astype(jnp.int32)
                syms.append((x & 31).astype(jnp.int32))
            return (x, pos + c), jnp.stack(syms)

        def v(tids):
            x0 = jnp.full((L,), 1 << 16, jnp.uint32)
            pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
            (xf, pf), syms = jax.lax.scan(
                block_body, (x0, pos0), tids.reshape(NB, K, L))
            return syms.reshape(T, L)
        return jax.jit(v)

    timeit("no gather, no select (const w)", make(False, "none", False), tids)
    timeit("no gather, onehot select of zeros", make(False, "onehot", False), tids)
    timeit("gather, fixed col select", make(False, "fixed", True), tids)
    timeit("gather, onehot select", make(False, "onehot", True), tids)
    timeit("gather+BARRIER, onehot select", make(True, "onehot", True), tids)
    timeit("gather+BARRIER, fixed col", make(True, "fixed", True), tids)


if __name__ == "__main__":
    main()
