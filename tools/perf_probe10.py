"""vmap(dynamic_slice) window fetch with real consumers; per-block cost."""
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
K = 8

rng = np.random.default_rng(0)
stream = jnp.asarray(rng.integers(0, 65536, size=1 << 22), jnp.uint32)
n = stream.shape[0]
pos_in = jnp.asarray(np.sort(rng.integers(0, n - K - 1, size=L)), jnp.int32)


def make(nb, form):
    def body(carry, _):
        pp, x = carry
        if form == "vds":
            w = jax.vmap(
                lambda q: jax.lax.dynamic_slice(stream, (q,), (K,)))(pp)
        elif form == "bcast":
            i = pp[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            w = stream[jnp.clip(i, 0, n - 1)]
        elif form == "flat1":
            w = stream[jnp.clip(pp, 0, n - 1)][:, None] * jnp.ones(
                (1, K), jnp.uint32)
        for k in range(K):
            x = (x << 1) ^ w[:, k]
        return (pp + (x & 1).astype(jnp.int32), x), x

    def v(p):
        x0 = jnp.zeros((L,), jnp.uint32)
        return jax.lax.scan(body, (p, x0), None, length=nb)[1]
    return jax.jit(v)


timeit("vmap-ds NB=72", make(72, "vds"), pos_in)
timeit("vmap-ds NB=18", make(18, "vds"), pos_in)
timeit("bcast   NB=18", make(18, "bcast"), pos_in)
timeit("flat 1-elem gather NB=18", make(18, "flat1"), pos_in)

# reference: probe4-d exact reproduction (sum output)
def repro(p):
    def body(pp, _):
        i = pp[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        w = stream[jnp.clip(i, 0, n - 1)]
        return pp + (w[:, 0] & 1).astype(jnp.int32), w.sum(dtype=jnp.uint32)
    return jax.lax.scan(body, p, None, length=72)[1]

timeit("repro probe4-d (sum out)", jax.jit(repro), pos_in)
