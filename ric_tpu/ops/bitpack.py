"""Vectorized variable-length bit packing via prefix sums + scatter-add.

This replaces the reference's serial bit FIFO (CMuxCodec::bitsCode/
bitsDecode, muxcodec.h:225-239). Encoder: field bit offsets come from an
exclusive cumsum of field lengths; each field contributes to at most two
32-bit words, and since contributions never overlap bits, scatter-ADD
equals scatter-OR. Decoder: offsets are recomputed from lengths the same
way, fields are extracted by a two-word gather. Both directions are single
fused XLA ops over millions of fields.

Stream convention: little-endian 32-bit words; a field's LSB sits at
absolute bit offset `off` = bit (off & 31) of word (off >> 5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def excl_cumsum(lens):
    """Exclusive prefix sum of an int32 1-D array. Returns (offsets, total)."""
    c = jnp.cumsum(lens)
    total = c[-1] if lens.shape[0] else jnp.int32(0)
    return c - lens, total


def field_mask(lens):
    """(2^len - 1) as uint32 for len in [0, 32]."""
    lens = lens.astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    # avoid shift-by-32: (1 << (len-1) << 1) - 1 ; len=0 handled by where
    m = ((jnp.uint32(1) << jnp.maximum(lens, 1) - 1) << 1) - 1
    return jnp.where(lens == 0, jnp.uint32(0), m.astype(jnp.uint32))


def _seg_or_last(keys, contrib, cap: int):
    """OR-combine contributions sharing the same (sorted) key, then gather
    each output word's combined value by binary search of the key run.

    Replaces scatter-add: XLA TPU scatter serializes (~50M updates/s) while
    this is log2(N) shifted-select OR passes + a sorted searchsorted — all
    parallel elementwise/gather work. (Manually unrolled rather than
    lax.associative_scan, whose recursive lowering compiles poorly at
    tens of millions of elements.)
    """
    n = keys.shape[0]
    acc = contrib
    steps = max(n - 1, 1).bit_length()
    for k in range(steps):
        d = 1 << k
        if d >= n:
            break
        same = keys[d:] == keys[:-d]
        shifted = jnp.where(same, acc[:-d], jnp.uint32(0))
        acc = acc.at[d:].set(acc[d:] | shifted)  # contiguous update, no scatter
    w = jnp.arange(cap, dtype=keys.dtype)
    idx = _searchsorted_right(keys, w, n) - 1
    idx_c = jnp.clip(idx, 0, n - 1)
    hit = (idx >= 0) & (keys[idx_c] == w)
    return jnp.where(hit, acc[idx_c], jnp.uint32(0))


def _searchsorted_right(keys, queries, n: int):
    """Unrolled vectorized binary search (jnp.searchsorted's scan lowering
    serializes badly on TPU at tens of millions of queries)."""
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(max(n - 1, 1).bit_length() + 1):
        mid = (lo + hi) >> 1
        km = keys[jnp.clip(mid, 0, n - 1)]
        go_right = km <= queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def pack(vals, lens, cap_words: int, aligned16: bool = False):
    """Pack fields (vals masked to lens bits) into a uint32 word buffer.

    vals: (N,) uint32/int32; lens: (N,) int32 in [0, 32].
    Returns (words[cap_words] uint32, total_bits int32).

    Scatter-add: contributions sharing a word never overlap bits, so add
    equals OR. aligned16=True asserts every field length and offset is a
    multiple of 16 (e.g. the rANS word stream), so no field straddles a
    word boundary and the spill scatter is skipped.
    """
    vals = vals.astype(jnp.uint32) & field_mask(lens)
    offs, total = excl_cumsum(lens)
    w0 = (offs >> 5).astype(jnp.int32)
    b = (offs & 31).astype(jnp.uint32)
    low = vals << b
    high = (vals >> (31 - b)) >> 1
    # Scatter-add: contributions sharing a word never overlap bits, so add
    # equals OR. (Measured on TPU: scatter ~16 ns/update beats the
    # segmented-scan + per-word binary-search alternative, whose cap-sized
    # random gathers are just as serialized as scatter.)
    words = jnp.zeros((cap_words,), jnp.uint32)
    words = words.at[w0].add(low, mode="drop")
    if not aligned16:
        words = words.at[w0 + 1].add(high, mode="drop")
    return words, total


def unpack(words, offs, lens):
    """Extract fields at absolute bit offsets (uint32 values). Offsets must
    be non-decreasing (they come from prefix sums everywhere)."""
    w0 = (offs >> 5).astype(jnp.int32)
    b = (offs & 31).astype(jnp.uint32)
    n = words.shape[0]
    lo = words[jnp.clip(w0, 0, n - 1)] >> b
    hi = (words[jnp.clip(w0 + 1, 0, n - 1)] << (31 - b)) << 1
    return (lo | hi) & field_mask(lens)
