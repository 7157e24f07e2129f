"""Universal integer codes: Golomb/Rice, exp-Golomb, Fibonacci, taboo.

Vectorized equivalents of the reference CMuxCodec integer-code zoo
(muxcodec.cpp:131-280 Fibonacci/taboo, 415-514 Golomb variants). Encoding
is fully data-parallel: each value maps to a (bits, length) field for the
prefix-sum bit packer (ops/bitpack). Decoding a self-delimiting code needs
its start offset; `*_decode_at` extracts one value per given offset in
parallel and returns (value, code length), so callers either track offsets
themselves (two-pass layouts) or walk fields with a scan (`decode_stream`).

Bit convention matches ops/bitpack: fields are packed LSB-first, so the
FIRST bit of a code is its LSB in the field value.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.ops import bitpack
from ric_tpu.utils.bits import bitlen

_FIB = [1, 2]
while _FIB[-1] < (1 << 31):
    _FIB.append(_FIB[-1] + _FIB[-2])
FIB = np.array(_FIB[:32], np.int32)  # reference nbFibo (muxcodec.cpp:131)


# --------------------------------------------------------------------------
# Golomb-Rice (power-of-two Golomb), reference golombCode k>=0 path
# --------------------------------------------------------------------------


def rice_encode(v, k: int, max_q: int = 26):
    """v >= 0 -> unary quotient (q ones then a zero) + k remainder bits.
    Field is LSB-first: remainder in the low k bits, then q ones, then 0.

    Contract: v >> k must be < max_q (one 32-bit field per code); callers
    pick k from the value range, as the reference picks its geo-coder k
    from adaptation (geomcodec.h:41-57). Larger quotients are clamped."""
    q = jnp.minimum(v >> k, max_q)
    ones = (jnp.uint32(1) << q) - 1  # q ones starting at bit k
    field = (v & ((1 << k) - 1)).astype(jnp.uint32) | (ones << k)
    length = q + 1 + k
    return field, length


def rice_decode_at(words, offs, k: int, max_q: int = 26):
    """Parallel decode at known offsets. Returns (value, length)."""
    probe = bitpack.unpack(words, offs, jnp.full(offs.shape, 32, jnp.int32))
    rem = (probe & ((1 << k) - 1)).astype(jnp.int32)
    unary = (probe >> k).astype(jnp.uint32)
    # count trailing ones = index of lowest zero bit
    low_zero = (~unary) & (unary + 1)
    q = bitlen(low_zero.astype(jnp.int32)) - 1
    q = jnp.minimum(q, max_q)
    return (q << k) | rem, q + 1 + k


def exp_golomb_encode(v, k: int = 0):
    """Exp-Golomb order k: m = bitlen(u)-1 zeros... here LSB-first variant:
    LSB-first: (bitlen(u)-1-k) ones + 0 length prefix, then the low
    bitlen(u)-1 bits of u = v + 2^k.

    Contract: code length 2*bitlen(u)-1-k <= 32, i.e. v + 2^k < 2^16
    for k=0 (one 32-bit field per code)."""
    u = (v + (1 << k)).astype(jnp.uint32)
    m = bitlen(u.astype(jnp.int32)) - 1  # payload bits after implicit top 1
    # LSB-first: (m - k) ones then a zero (length prefix), then low m bits
    ones = (jnp.uint32(1) << jnp.maximum(m - k, 0)) - 1
    pref_len = jnp.maximum(m - k, 0) + 1
    payload = u & ((jnp.uint32(1) << m) - 1)
    field = ones | (payload << pref_len)
    return field, pref_len + m


def exp_golomb_decode_at(words, offs, k: int = 0):
    probe = bitpack.unpack(words, offs, jnp.full(offs.shape, 32, jnp.int32))
    low_zero = (~probe) & (probe + 1)
    nz = bitlen(low_zero.astype(jnp.int32)) - 1  # number of leading ones
    m = nz + k
    payload = (probe >> (nz + 1)) & ((jnp.uint32(1) << m) - 1)
    u = payload | (jnp.uint32(1) << m)
    return (u.astype(jnp.int32) - (1 << k)), nz + 1 + m


def golomb_lin_encode(v, k0: int, m: int, max_g: int = 16):
    """Golomb with linearly growing parameter (muxcodec.cpp:466-514): the
    Rice parameter k grows by 1 for every 2^m units of unary prefix.
    Capacity before growth step g is (2^g - 1) << (k0 + m).

    Field (LSB-first): (l-1) zeros, a 1, then k remainder bits, with
    l = 1 + g*2^m + (rem >> k), k = k0 + g. Contract: l + k <= 32."""
    v = v.astype(jnp.int32)
    caps = np.array([((1 << g) - 1) << (k0 + m) for g in range(max_g + 1)],
                    np.int64)
    caps = np.minimum(caps, np.int64(2**31 - 1)).astype(np.int32)
    g = jnp.sum(
        (v[..., None] >= jnp.asarray(caps)[1:][None, :]).astype(jnp.int32),
        axis=-1,
    )
    rem = v - jnp.asarray(caps)[g]
    k = k0 + g
    q = rem >> k
    l = 1 + (g << m) + q
    field = (jnp.uint32(1) << (l - 1)) | (
        (rem & ((jnp.int32(1) << k) - 1)).astype(jnp.uint32) << l
    )
    return field, l + k


def golomb_lin_decode_at(words, offs, k0: int, m: int, max_g: int = 16):
    probe = bitpack.unpack(words, offs, jnp.full(offs.shape, 32, jnp.int32))
    low = probe & (~probe + 1)
    zeros = bitlen(low.astype(jnp.int32)) - 1  # l - 1
    g = zeros >> m
    q = zeros & ((1 << m) - 1)
    k = k0 + g
    caps = np.array([((1 << gg) - 1) << (k0 + m) for gg in range(max_g + 1)],
                    np.int64)
    caps = np.minimum(caps, np.int64(2**31 - 1)).astype(np.int32)
    l = zeros + 1
    lowbits = (probe >> l) & ((jnp.uint32(1) << k) - 1)
    val = jnp.asarray(caps)[jnp.clip(g, 0, max_g)] + (q << k) + lowbits.astype(
        jnp.int32
    )
    return val, l + k


# --------------------------------------------------------------------------
# Fibonacci codes (Zeckendorf + terminating "11"), muxcodec.cpp:138-197
# --------------------------------------------------------------------------


def fibonacci_encode(v):
    """v >= 0. Zeckendorf decomposition over FIB (1,2,3,5,...), bit i set if
    FIB[i] used; terminated by an extra 1 after the highest bit. LSB-first
    field: bit i of the field = FIB[i] used; terminator at bit (top+1)."""
    v = v.astype(jnp.uint32) + 1  # code positive integers; shift domain
    fib = jnp.asarray(FIB, jnp.uint32)

    def step(i, carry):
        rem, bits = carry
        idx = 31 - i
        take = rem >= fib[idx]
        rem = jnp.where(take, rem - fib[idx], rem)
        bits = bits | jnp.where(take, jnp.uint32(1) << idx, jnp.uint32(0))
        return rem, bits

    _, bits = jax.lax.fori_loop(
        0, 32, step, (v, jnp.zeros_like(v))
    )
    top = bitlen(bits.astype(jnp.int32)) - 1
    field = bits | (jnp.uint32(1) << (top + 1))
    return field, top + 2


def fibonacci_decode_at(words, offs):
    probe = bitpack.unpack(words, offs, jnp.full(offs.shape, 32, jnp.int32))
    # find the first "11" pair: t = probe & (probe >> 1); lowest set bit
    pair = probe & (probe >> 1)
    low = pair & (~pair + 1)
    term = bitlen(low.astype(jnp.int32)) - 1  # top Zeckendorf bit position
    mask = (jnp.uint32(1) << (term + 1)) - 1  # include the top bit itself
    zeck = (probe & mask).astype(jnp.int32)
    fib = jnp.asarray(FIB)
    val = jnp.zeros_like(zeck)

    def step(i, val):
        return val + jnp.where((zeck >> i) & 1 == 1, fib[i], 0)

    val = jax.lax.fori_loop(0, 32, step, val)
    return (val - 1).astype(jnp.int32), term + 2


# --------------------------------------------------------------------------
# Taboo codes (Pigeon), muxcodec.cpp:199-280 — own construction
# --------------------------------------------------------------------------
#
# An n-bit-taboo code is a sequence of n-bit digits none of which equals the
# all-zero taboo digit, terminated by the taboo digit. Values are assigned
# in length order. We use base b = 2^n - 1 digits remapped to 1..2^n-1.


def _taboo_counts(n: int, max_digits: int = 10):
    b = (1 << n) - 1
    counts = [1]  # 0 digits encodes value 0
    for i in range(1, max_digits + 1):
        counts.append(counts[-1] * b)
    cum = np.cumsum(counts)
    return np.array(counts, np.int32), cum.astype(np.int32)


def taboo_encode(v, n: int = 2, max_digits: int = 10):
    """Taboo code with n-bit taboo digit (all zeros). Returns (field, len);
    LSB-first: digits then the taboo terminator. Values must fit in
    32-len... use n=2, v < ~3^9 for 32-bit fields."""
    counts, cum = _taboo_counts(n, max_digits)
    b = (1 << n) - 1
    v = v.astype(jnp.int32)
    ndig = jnp.sum((v >= jnp.asarray(cum)[None, :].T).astype(jnp.int32), axis=0)
    rem = v - jnp.where(ndig > 0, jnp.asarray(cum)[jnp.maximum(ndig - 1, 0)], 0)

    def step(i, carry):
        rem, field = carry
        digit = (rem % b).astype(jnp.int32) + 1  # 1..b (avoid taboo 0)
        use = i < ndig
        field = jnp.where(use, field | (digit << (n * i)), field)
        rem = jnp.where(use, rem // b, rem)
        return rem, field

    _, field = jax.lax.fori_loop(
        0, max_digits, step, (rem, jnp.zeros_like(v))
    )
    return field.astype(jnp.uint32), (ndig + 1) * n


def taboo_decode_at(words, offs, n: int = 2, max_digits: int = 10):
    counts, cum = _taboo_counts(n, max_digits)
    b = (1 << n) - 1
    probe = bitpack.unpack(words, offs, jnp.full(offs.shape, 32, jnp.int32))

    def find_term(carry):
        i, done = carry
        digit = (probe >> (n * i)) & ((1 << n) - 1)
        stop = digit == 0
        return i + (~stop & ~done).astype(jnp.int32), done | stop

    ndig = jnp.zeros(probe.shape, jnp.int32)
    done = jnp.zeros(probe.shape, bool)
    for i in range(max_digits + 1):
        digit = (probe >> (n * i)) & ((1 << n) - 1)
        stop = (digit == 0) & ~done
        done = done | stop
        ndig = ndig + (~done).astype(jnp.int32)
    val = jnp.zeros(probe.shape, jnp.int32)
    mul = jnp.ones(probe.shape, jnp.int32)
    for i in range(max_digits):
        digit = ((probe >> (n * i)) & ((1 << n) - 1)).astype(jnp.int32)
        use = i < ndig
        val = val + jnp.where(use, (digit - 1) * mul, 0)
        mul = jnp.where(use, mul * b, mul)
    base = jnp.where(
        ndig > 0, jnp.asarray(cum)[jnp.maximum(ndig - 1, 0)], 0
    )
    return (val + base).astype(jnp.int32), (ndig + 1) * n


# --------------------------------------------------------------------------
# Sequential stream walk (for tests / small headers)
# --------------------------------------------------------------------------


def decode_stream(words, n_values: int, decode_at, max_len: int = 32):
    """Decode n_values consecutive self-delimiting codes with a scan."""
    def step(off, _):
        v, ln = decode_at(words, off[None])
        return off + ln[0], v[0]

    _, vals = jax.lax.scan(
        step, jnp.int32(0), None, length=n_values
    )
    return vals
