"""Bisect: which structural element makes the in-scan gather slow."""
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

rng = np.random.default_rng(0)
stream = jnp.asarray(rng.integers(0, 65536, size=T * L // 4 + K), jnp.uint32)
n = stream.shape[0]
pos_in = jnp.asarray(np.sort(rng.integers(0, n - K, size=L)), jnp.int32)
tids = jnp.asarray(rng.integers(0, 64, size=(T, L)), jnp.int32)


def win_of(pp):
    i = pp[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return stream[jnp.clip(i, 0, n - 1)]


def vA(p):  # fast body + full (L,K) output
    def body(pp, _):
        w = win_of(pp)
        return pp + (w[:, 0] & 1).astype(jnp.int32), w
    return jax.lax.scan(body, p, None, length=NB)[1]


def vB(p):  # + x carry consuming all K columns sequentially
    def body(carry, _):
        pp, x = carry
        w = win_of(pp)
        for k in range(K):
            x = (x << 1) ^ w[:, k]
        return (pp + (x & 1).astype(jnp.int32), x), x
    x0 = jnp.zeros((L,), jnp.uint32)
    return jax.lax.scan(body, (p, x0), None, length=NB)[1]


def vC(p):  # x carry consuming only column 0
    def body(carry, _):
        pp, x = carry
        w = win_of(pp)
        x = (x << 1) ^ w[:, 0]
        return (pp + (x & 1).astype(jnp.int32), x), x
    x0 = jnp.zeros((L,), jnp.uint32)
    return jax.lax.scan(body, (p, x0), None, length=NB)[1]


def vD(p):  # pos depends on data read (feedback into gather idx)
    def body(carry, _):
        pp, x = carry
        w = win_of(pp)
        x = (x << 1) ^ w[:, 0]
        return (pp + (w[:, 0] & 1).astype(jnp.int32), x), x
    x0 = jnp.zeros((L,), jnp.uint32)
    return jax.lax.scan(body, (p, x0), None, length=NB)[1]


def vE(p):  # like vB but via scanned tid input too
    def body(carry, tid_b):
        pp, x = carry
        w = win_of(pp)
        for k in range(K):
            x = (x << 1) ^ w[:, k] ^ tid_b[k].astype(jnp.uint32)
        return (pp + (x & 1).astype(jnp.int32), x), x
    x0 = jnp.zeros((L,), jnp.uint32)
    return jax.lax.scan(body, (p, x0), tids.reshape(NB, K, L))[1]


for name, fn, args in [
    ("A: gather -> (L,K) output, pos carry", vA, (pos_in,)),
    ("C: gather col0 -> x carry", vC, (pos_in,)),
    ("D: gather col0 -> x carry + pos feedback", vD, (pos_in,)),
    ("B: gather all cols -> x carry", vB, (pos_in,)),
    ("E: B + tid scan input", vE, (pos_in,)),
]:
    timeit(name, jax.jit(fn), *args)
