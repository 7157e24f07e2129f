"""Compare HLO of fast vs slow in-scan gather variants."""
import re
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

L = 32768
T = 576
K = 8
NB = T // K

rng = np.random.default_rng(0)
tids = jnp.asarray(rng.integers(0, 64, size=(T, L)), jnp.int32)
stream = jnp.asarray(rng.integers(0, 65536, size=T * L // 4 + K), jnp.uint32)
n = stream.shape[0]
pos_in = jnp.asarray(np.sort(rng.integers(0, n - K, size=L)), jnp.int32)


def fast_fn(s, p):
    def body(pp, _):
        i = pp[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        w = s[jnp.clip(i, 0, n - 1)]
        return pp + (w[:, 0] & 1).astype(jnp.int32), w.sum(dtype=jnp.uint32)
    return jax.lax.scan(body, p, None, length=NB)[1]


def slow_fn(tids):
    def block_body(carry, tid_b):
        x, pos = carry
        win = stream[jnp.clip(
            pos[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
            0, n - 1)]
        c = jnp.zeros((L,), jnp.int32)
        syms = []
        for k in range(K):
            xn = x * jnp.uint32(1664525) + tid_b[k].astype(jnp.uint32)
            need = xn < (1 << 20)
            w = win[:, k]
            x = jnp.where(need, (xn << 16) | w, xn)
            c = c + need.astype(jnp.int32)
            syms.append((x & 31).astype(jnp.int32))
        return (x, pos + c), jnp.stack(syms)

    x0 = jnp.full((L,), 1 << 16, jnp.uint32)
    pos0 = jnp.arange(L, dtype=jnp.int32) * (T // 4)
    (xf, pf), syms = jax.lax.scan(
        block_body, (x0, pos0), tids.reshape(NB, K, L))
    return syms.reshape(T, L)


def dump(name, fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    print(f"===== {name}: gather-related lines =====")
    for line in txt.splitlines():
        if re.search(r"gather|fusion_kind|dynamic-slice\(", line):
            s = line.strip()
            if len(s) > 220:
                s = s[:220]
            print(s)
    print()


dump("FAST", fast_fn, stream, pos_in)
dump("SLOW", slow_fn, tids)
