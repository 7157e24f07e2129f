"""Primitive-op timing probe on the real TPU: quantifies the costs that
decide the decode-kernel design (gathers vs one-hot matmuls vs scan
machinery). Run: PYTHONPATH=/root/.axon_site:. python tools/perf_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:45s} {dt*1e3:9.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 1 << 24  # ~16.8M elements, the A-stream field count scale
    L = 32768
    T = 580

    table = jnp.asarray(rng.integers(0, 1 << 24, size=2048), jnp.uint32)
    idx_rand = jnp.asarray(rng.integers(0, 2048, size=N), jnp.int32)
    big = jnp.asarray(rng.integers(0, 1 << 24, size=N), jnp.uint32)
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, N, size=N)), jnp.int32)
    idx_big_rand = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)

    g1 = jax.jit(lambda t, i: t[i])
    timeit("gather 16.8M from 8KB table", g1, table, idx_rand)
    timeit("gather 16.8M from 64MB arr (random)", g1, big, idx_big_rand)
    g2 = jax.jit(lambda t, i: jnp.take(t, i, indices_are_sorted=True))
    timeit("gather 16.8M from 64MB arr (sorted)", g2, big, idx_sorted)

    sc = jax.jit(
        lambda i, v: jnp.zeros((N,), jnp.uint32).at[i].add(v, mode="drop")
    )
    timeit("scatter-add 16.8M into 64MB", sc, idx_big_rand, big)

    # one-hot matmul lookup, chunked, as rans._table_lookup_f32
    from ric_tpu.ops.rans import _table_lookup_f32
    tf32 = table.astype(jnp.float32)
    oh = jax.jit(lambda i, t: _table_lookup_f32(i, t))
    timeit("one-hot matmul lookup 16.8M x 2048", oh, idx_rand, tf32)

    # scan overheads at decode shapes
    tids = jnp.asarray(rng.integers(0, 64, size=(T, L)), jnp.int32)
    acts = jnp.ones((T, L), bool)
    stream = jnp.asarray(rng.integers(0, 65536, size=4 * L * 8), jnp.uint32)

    def scan_arith(tids, acts):
        def step(x, inp):
            tid, act = inp
            xn = x * jnp.uint32(1664525) + tid.astype(jnp.uint32)
            return jnp.where(act, xn, x), (x & 31).astype(jnp.int32)
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        return jax.lax.scan(step, x0, (tids, acts))[1]

    timeit(f"scan {T}x{L} arithmetic only", jax.jit(scan_arith), tids, acts)

    lut = jnp.asarray(rng.integers(0, 1 << 24, size=(64, 4096)), jnp.uint32)

    def scan_gather(tids, acts):
        def step(x, inp):
            tid, act = inp
            slot = (x & jnp.uint32(4095)).astype(jnp.int32)
            e = lut[tid, slot]
            xn = x * jnp.uint32(3) + e
            return jnp.where(act, xn, x), (x & 31).astype(jnp.int32)
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        return jax.lax.scan(step, x0, (tids, acts))[1]

    timeit(f"scan {T}x{L} + 2D-LUT gather", jax.jit(scan_gather), tids, acts)

    def scan_stream(tids, acts):
        n = stream.shape[0]
        def step(carry, inp):
            x, pos = carry
            tid, act = inp
            xn = x * jnp.uint32(1664525) + tid.astype(jnp.uint32)
            need = act & (xn < (1 << 16))
            w = stream[jnp.clip(pos, 0, n - 1)]
            xn = jnp.where(need, (xn << 16) | w, xn)
            pos = pos + need.astype(jnp.int32)
            return (jnp.where(act, xn, x), pos), (x & 31).astype(jnp.int32)
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        pos0 = jnp.arange(L, dtype=jnp.int32) * 4
        return jax.lax.scan(step, (x0, pos0), (tids, acts))[1]

    timeit(f"scan {T}x{L} + stream gather", jax.jit(scan_stream), tids, acts)

    # in-scan one-hot matmul row fetch: (L,64)@(64,32) x2
    cum = jnp.asarray(rng.integers(0, 4096, size=(64, 32)), jnp.float32)

    def scan_matmul(tids, acts):
        cols = jnp.arange(64, dtype=jnp.int32)
        def step(x, inp):
            tid, act = inp
            ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
            rows = jnp.dot(ohot, cum, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            slot = (x & jnp.uint32(4095)).astype(jnp.int32)
            sym = jnp.sum(
                (slot[:, None].astype(jnp.float32) >= rows).astype(jnp.int32),
                axis=1)
            xn = x * jnp.uint32(3) + sym.astype(jnp.uint32)
            return jnp.where(act, xn, x), sym
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        return jax.lax.scan(step, x0, (tids, acts))[1]

    timeit(f"scan {T}x{L} + one-hot row fetch", jax.jit(scan_matmul),
           tids, acts)

    # per-step cross-lane cumsum cost
    def scan_cumsum(tids, acts):
        def step(x, inp):
            tid, act = inp
            xn = x * jnp.uint32(1664525) + tid.astype(jnp.uint32)
            need = act & (xn < (1 << 20))
            p = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
            xn = xn + p.astype(jnp.uint32)
            return jnp.where(act, xn, x), (x & 31).astype(jnp.int32)
        x0 = jnp.full((L,), 1 << 16, jnp.uint32)
        return jax.lax.scan(step, x0, (tids, acts))[1]

    timeit(f"scan {T}x{L} + cross-lane cumsum", jax.jit(scan_cumsum),
           tids, acts)


if __name__ == "__main__":
    main()
