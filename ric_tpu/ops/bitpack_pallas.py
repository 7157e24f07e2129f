"""Pallas TPU kernels for variable-length bit packing/unpacking.

XLA TPU scatter/gather serialize at ~8-20 ns per element, which made the
prefix-sum bit packer the encoder's hottest stage. These kernels exploit
two structural facts:

  * field bit offsets are sorted, so a chunk of C consecutive fields
    touches a bounded window of C+2 consecutive output words;
  * contributions landing in one word never overlap bits, so summation
    equals OR, and each 16-bit half of a word sums to < 2^16 — exactly
    representable in f32.

Pack, per chunk: build the (WIN, C) one-hot field->window-word matrix in
f32 and multiply by the four 16-bit contribution columns on the MXU
(the "high" spill into word w+1 reuses the same one-hot with a roll of the
result). The window is read-modify-written via DMA; the TPU grid is
sequential, so overlapping boundary words accumulate safely. Unpack is the
transposed product. Fields must be <= 32 bits; offsets come from an XLA
cumsum outside; per-chunk window starts are scalar-prefetched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024  # 1-D arrays are 1024-tiled on TPU; block shapes must match
# HBM slices must be 1024-word aligned/sized; windows start at the aligned
# word below the chunk's first offset and span 3072 words (1023 align slack
# + CHUNK*32 bits / 32 words + 2 edge < 3072).
WIN = 3072
ALIGN = 1024
_PARTS = WIN // 1024


def _field_mask(lens):
    lm = (
        ((jnp.uint32(1) << (jnp.maximum(lens, 1).astype(jnp.uint32) - 1)) << 1)
        - 1
    )
    return jnp.where(lens == 0, jnp.uint32(0), lm)


def _pack_kernel(sw_ref, vals_ref, lens_ref, offs_ref, _in_alias, out_ref):
    # _in_alias is the zero buffer aliased onto out_ref
    c = pl.program_id(0)
    sw = pl.multiple_of(sw_ref[c], ALIGN)

    def inner(win, sem):
        cp_in = pltpu.make_async_copy(out_ref.at[pl.ds(sw, WIN)], win, sem)
        cp_in.start()
        vals = vals_ref[:] & _field_mask(lens_ref[:])
        rel = offs_ref[:] - sw * 32
        w_local = (rel >> 5).astype(jnp.int32)
        b = (rel & 31).astype(jnp.uint32)
        lo = vals << b
        hi = (vals >> (31 - b)) >> 1
        cols = jnp.stack(
            [
                (lo & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32),
                (lo >> 16).astype(jnp.int32).astype(jnp.float32),
                (hi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32),
                (hi >> 16).astype(jnp.int32).astype(jnp.float32),
            ],
            axis=1,
        )  # (C, 4)
        parts = []
        for part in range(_PARTS):  # split so the one-hots fit VMEM
            widx = jax.lax.broadcasted_iota(
                jnp.int32, (1024, CHUNK), 0
            ) + part * 1024
            oh_lo = (widx == w_local[None, :]).astype(jnp.float32)
            oh_hi = (widx == (w_local + 1)[None, :]).astype(jnp.float32)
            a = jax.lax.dot_general(
                oh_lo, cols[:, :2],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                oh_hi, cols[:, 2:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(a)
        acc = jnp.concatenate(parts, axis=0)  # (WIN, 2) halves
        lsum = acc[:, 0].astype(jnp.int32).astype(jnp.uint32)
        hsum = acc[:, 1].astype(jnp.int32).astype(jnp.uint32)
        word = lsum | (hsum << 16)
        cp_in.wait()
        win[:] = win[:] | word
        cp_out = pltpu.make_async_copy(win, out_ref.at[pl.ds(sw, WIN)], sem)
        cp_out.start()
        cp_out.wait()

    pl.run_scoped(
        inner,
        pltpu.VMEM((WIN,), jnp.uint32),
        pltpu.SemaphoreType.DMA(()),
    )


def pack_tpu(vals, lens, cap_words: int):
    """Pallas pack. Returns (words (cap_words,), total_bits)."""
    n = vals.shape[0]
    pad = (-n) % CHUNK
    if pad:
        vals = jnp.concatenate([vals.astype(jnp.uint32),
                                jnp.zeros((pad,), jnp.uint32)])
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    else:
        vals = vals.astype(jnp.uint32)
    csum = jnp.cumsum(lens)
    total = csum[n - 1] if n else jnp.int32(0)
    offs = (csum - lens).astype(jnp.int32)
    nchunks = vals.shape[0] // CHUNK
    sw = ((offs[::CHUNK] >> 5) & ~(ALIGN - 1)).astype(jnp.int32)
    cap = -(-(cap_words + WIN + ALIGN) // ALIGN) * ALIGN  # aligned + slack
    zero = jnp.zeros((cap,), jnp.uint32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
            pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
            pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    words = pl.pallas_call(
        _pack_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap,), jnp.uint32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sw, vals, lens, offs, zero)
    return words[:cap_words], total


def _unpack_kernel(sw_ref, offs_ref, lens_ref, words_ref, out_ref):
    c = pl.program_id(0)
    sw = pl.multiple_of(sw_ref[c], ALIGN)

    def inner(win, sem):
        cp = pltpu.make_async_copy(words_ref.at[pl.ds(sw, WIN)], win, sem)
        cp.start()
        rel = offs_ref[:] - sw * 32
        w_local = (rel >> 5).astype(jnp.int32)
        b = (rel & 31).astype(jnp.uint32)
        cp.wait()
        w = win[:]
        wl = (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        wh = (w >> 16).astype(jnp.int32).astype(jnp.float32)
        halves = jnp.stack([wl, wh], axis=1)  # (WIN, 2)
        g = jnp.zeros((CHUNK, 4), jnp.float32)
        for part in range(_PARTS):  # split so the one-hots fit VMEM
            widx = jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, 1024), 1
            ) + part * 1024
            oh0 = (w_local[:, None] == widx).astype(jnp.float32)
            oh1 = ((w_local + 1)[:, None] == widx).astype(jnp.float32)
            hpart = halves[part * 1024 : (part + 1) * 1024]
            g0 = jax.lax.dot_general(
                oh0, hpart, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g1 = jax.lax.dot_general(
                oh1, hpart, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = g + jnp.concatenate([g0, g1], axis=1)  # (C, 4)
        w0 = g[:, 0].astype(jnp.int32).astype(jnp.uint32) | (g[:, 1].astype(jnp.int32).astype(jnp.uint32) << 16)
        w1 = g[:, 2].astype(jnp.int32).astype(jnp.uint32) | (g[:, 3].astype(jnp.int32).astype(jnp.uint32) << 16)
        lo = w0 >> b
        hi = (w1 << (31 - b)) << 1
        out_ref[:] = (lo | hi) & _field_mask(lens_ref[:])

    pl.run_scoped(
        inner,
        pltpu.VMEM((WIN,), jnp.uint32),
        pltpu.SemaphoreType.DMA(()),
    )


def unpack_tpu(words, offs, lens):
    """Pallas unpack: extract fields at sorted absolute bit offsets."""
    n = offs.shape[0]
    pad = (-n) % CHUNK
    offs = offs.astype(jnp.int32)
    if pad:
        last = offs[n - 1] if n else jnp.int32(0)
        offs = jnp.concatenate([offs, jnp.full((pad,), last, jnp.int32)])
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    nchunks = offs.shape[0] // CHUNK
    sw = ((offs[::CHUNK] >> 5) & ~(ALIGN - 1)).astype(jnp.int32)
    capw = -(-(words.shape[0] + WIN + ALIGN) // ALIGN) * ALIGN
    words = jnp.concatenate(
        [words, jnp.zeros((capw - words.shape[0],), jnp.uint32)]
    )  # aligned tail slack for the last window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
            pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK,), lambda c, sw: (c,)),
    )
    out = pl.pallas_call(
        _unpack_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((offs.shape[0],), jnp.uint32),
    )(sw, offs, lens, words)
    return out[:n]
