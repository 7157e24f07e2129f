"""Enumerative C(16,k) pattern coding + phase-in economy codes — vectorized.

TPU-native equivalent of reference CMuxCodec::enumCode/enumDecode +
maxCode/maxDecode (muxcodec.cpp:282-413,516-534). The reference codes the
rank serially into its bit FIFO with a phase-in to save the fractional bit;
here ranking/unranking are 16-step vectorized loops over all blocks at
once, and the phase-in is split into a fixed-width "hi" field plus an
optional 1-bit "extra" field so that field lengths stay derivable by the
parallel decoder (see ops/bitpack.py).

Phase-in code for v in [0, N), L = floor(log2 N), th = 2^(L+1) - N:
  v < th       -> emit v in L bits
  v >= th      -> emit (v+th) in L+1 bits (hi part L bits, low bit separate)
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

# Pascal triangle C(n, k) for n,k in [0, 16]
_C = np.zeros((17, 17), dtype=np.int64)
for n in range(17):
    _C[n, 0] = 1
    for k in range(1, n + 1):
        _C[n, k] = _C[n - 1, k - 1] + _C[n - 1, k]

CNK16 = jnp.asarray(_C, jnp.int32)

# Phase-in parameters for the C(16,k) rank alphabet, per k
CNK_L = np.array([max(int(_C[16, k]).bit_length() - 1, 0) for k in range(17)],
                 dtype=np.int32)
CNK_TH = np.array([(1 << (CNK_L[k] + 1)) - int(_C[16, k]) for k in range(17)],
                  dtype=np.int32)


def phase_in_params(n_values: int):
    """(L, th) for a phase-in code over [0, n_values)."""
    L = max(n_values.bit_length() - 1, 0) if n_values > 1 else 0
    if n_values <= 1:
        return 0, 1
    if (1 << L) == n_values:
        return L, 1 << L  # exact power of two: all values use L bits
    return L, (1 << (L + 1)) - n_values


def phase_in_encode(v, L: int, th: int):
    """Split phase-in encode. Returns (hi_val, hi_len, ex_bit, ex_len)."""
    long_code = v >= th
    hi = jnp.where(long_code, (v + th) >> 1, v)
    ex = jnp.where(long_code, (v + th) & 1, 0)
    return hi, jnp.where(long_code, L, L), ex, long_code.astype(jnp.int32)


def phase_in_decode(hi, ex, th: int):
    """Inverse given the hi field and the extra bit (0 where absent)."""
    long_code = hi >= th
    return jnp.where(long_code, ((hi << 1) | ex) - th, hi)


def phase_in_extra_mask(hi, th: int):
    return hi >= th


def _row_lookup(row_np, k_rem):
    """C(n-1, k_rem) via a select chain over the static row — TPU gathers
    serialize at ~tens of ns/element, a 17-way select chain is pure VPU."""
    out = jnp.zeros(k_rem.shape, jnp.int32)
    for kk, v in enumerate(row_np):
        if v:
            out = jnp.where(k_rem == kk, jnp.int32(int(v)), out)
    return out


def pattern_rank(pattern, k):
    """Rank of a 16-bit significance pattern among C(16,k) patterns.

    pattern: int32, bit (15-i) = coeff i significant (matches the MSB-first
    shift order of reference block_enum, bandcodec.cpp:355-365). Unrolled
    with per-step static C rows (no gathers).
    """
    rank = jnp.zeros_like(pattern)
    k_rem = k.astype(jnp.int32)
    for i in range(16):
        bit = (pattern >> (15 - i)) & 1
        add = _row_lookup(_C[16 - i - 1], k_rem)
        rank = rank + jnp.where(bit == 1, add, 0)
        k_rem = k_rem - bit
    return rank


def pattern_unrank(rank, k):
    """Inverse of pattern_rank."""
    pattern = jnp.zeros_like(rank)
    k_rem = k.astype(jnp.int32)
    for i in range(16):
        n_rem = 16 - i
        c = _row_lookup(_C[n_rem - 1], k_rem)
        take = (rank >= c) | (k_rem >= n_rem)
        pattern = pattern | (take.astype(jnp.int32) << (15 - i))
        rank = rank - jnp.where(take, c, 0)
        k_rem = k_rem - take.astype(jnp.int32)
    return pattern
