"""Pallas capability + timing probe on the axon TPU. Decides whether the
decode scan becomes a Pallas kernel (grid-as-timeloop, VMEM carries)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, reps=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:45s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:45s} {dt*1e3:9.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    N = 1 << 24
    big = jnp.asarray(rng.integers(0, 1 << 24, size=N), jnp.uint32)
    idx_np = rng.integers(0, N, size=N)
    idx_big_rand = jnp.asarray(idx_np, jnp.int32)

    # sanity: bulk gather with value check
    g1 = jax.jit(lambda t, i: t[i].sum(dtype=jnp.uint64))
    out = timeit("bulk gather + sum (sanity)", g1, big, idx_big_rand)
    expect = np.asarray(big)[idx_np].sum(dtype=np.uint64)
    print(f"  gather sum check: {int(out) == int(expect)}")

    # 1. trivial pallas kernel
    def k_triv(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    x = jnp.ones((256, 128), jnp.int32)
    f = jax.jit(lambda x: pl.pallas_call(
        k_triv, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    timeit("pallas trivial", f, x)

    # 2. sequential grid with scratch carry: cumulative sum over grid steps
    T = 512
    data = jnp.asarray(rng.integers(0, 100, size=(T, 256, 128)), jnp.int32)

    def k_carry(x_ref, o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += x_ref[0]
        o_ref[0] = acc_ref[:]

    f2 = jax.jit(lambda d: pl.pallas_call(
        k_carry,
        out_shape=jax.ShapeDtypeStruct((T, 256, 128), jnp.int32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 256, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 128), jnp.int32)])(d))
    r = timeit(f"pallas grid T={T} carry (per-step?)", f2, data)
    if r is not None:
        ok = np.array_equal(np.asarray(r), np.cumsum(np.asarray(data), 0))
        print(f"  carry check: {ok}")

    # 3. per-lane gather from a VMEM table inside a kernel
    table = jnp.asarray(rng.integers(0, 1 << 24, size=(4096,)), jnp.int32)
    gidx = jnp.asarray(rng.integers(0, 4096, size=(256, 128)), jnp.int32)

    def k_gather(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[:][i_ref[:]]

    f3 = jax.jit(lambda t, i: pl.pallas_call(
        k_gather, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
    r = timeit("pallas VMEM 1D table gather 32k", f3, table, gidx)
    if r is not None:
        ok = np.array_equal(np.asarray(r), np.asarray(table)[np.asarray(gidx)])
        print(f"  gather check: {ok}")

    # 3b. take_along_axis per-lane-column gather
    tab2 = jnp.asarray(rng.integers(0, 1 << 24, size=(64, 128)), jnp.int32)
    gidx2 = jnp.asarray(rng.integers(0, 64, size=(8, 128)), jnp.int32)

    def k_taa(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    f3b = jax.jit(lambda t, i: pl.pallas_call(
        k_taa, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
    r = timeit("pallas take_along_axis col gather", f3b, tab2, gidx2)
    if r is not None:
        ok = np.array_equal(
            np.asarray(r),
            np.take_along_axis(np.asarray(tab2), np.asarray(gidx2), 0))
        print(f"  taa check: {ok}")

    # 4. one-hot matmul inside kernel
    cum = jnp.asarray(rng.integers(0, 4096, size=(64, 32)), jnp.float32)
    tids = jnp.asarray(rng.integers(0, 64, size=(256, 128)), jnp.int32)

    def k_oh(c_ref, t_ref, o_ref):
        tid = t_ref[:].reshape(-1)
        ohot = (tid[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (tid.shape[0], 64), 1)).astype(jnp.float32)
        rows = jnp.dot(ohot, c_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jnp.sum(rows, axis=1).reshape(256, 128).astype(jnp.int32)

    f4 = jax.jit(lambda c, t: pl.pallas_call(
        k_oh, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(c, t))
    r = timeit("pallas one-hot matmul 32k x (64,32)", f4, cum, tids)
    if r is not None:
        rows = np.asarray(cum)[np.asarray(tids).reshape(-1)]
        ok = np.array_equal(np.asarray(r).reshape(-1),
                            rows.sum(1).astype(np.int32))
        print(f"  onehot check: {ok}")

    # 5. roll inside kernel
    def k_roll(x_ref, o_ref):
        v = x_ref[:]
        acc = v
        for d in (1, 2, 4):
            acc = acc + pltpu.roll(acc, d, 1)
        o_ref[:] = acc

    f5 = jax.jit(lambda x: pl.pallas_call(
        k_roll, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    timeit("pallas roll x3", f5, gidx)

    # 6. cumsum of (256,128) inside kernel (for cross-lane prefix)
    def k_cumsum(x_ref, o_ref):
        v = x_ref[:].reshape(-1)
        o_ref[:] = jnp.cumsum(v).reshape(256, 128)

    f6 = jax.jit(lambda x: pl.pallas_call(
        k_cumsum, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    r = timeit("pallas 32k cumsum", f6, gidx)
    if r is not None:
        ok = np.array_equal(np.asarray(r).reshape(-1),
                            np.cumsum(np.asarray(gidx).reshape(-1)))
        print(f"  cumsum check: {ok}")

    # 7. dynamic slice from a big VMEM buffer at runtime scalar offset
    stream = jnp.asarray(rng.integers(0, 65536, size=(1 << 20,)), jnp.uint32)

    def k_ds(s_ref, off_ref, o_ref):
        off = off_ref[0]
        o_ref[:] = s_ref[pl.ds(off * 128, 32768)].reshape(256, 128)

    f7 = jax.jit(lambda s, o: pl.pallas_call(
        k_ds, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, o))
    timeit("pallas dynamic slice from 4MB VMEM", f7, stream,
           jnp.asarray([37], jnp.int32))


if __name__ == "__main__":
    main()
