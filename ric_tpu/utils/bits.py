"""Integer bit-trick helpers (jnp, int32).

TPU-native equivalents of reference lib/utils.h:79-138. All functions are
elementwise over int32 arrays and jit-safe. Arithmetic right shift semantics
(round toward -inf on negatives) follow XLA's shift_right_arithmetic, which
matches the reference's C signed shifts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def s2u(s):
    """Signed -> unsigned zigzag, negatives first: 0,-1,1,-2,2 -> 0,1,2,3,4.

    Reference utils.h:79-84.
    """
    u = -(2 * s + 1)
    return u ^ (u >> 31)


def u2s(u):
    """Inverse of s2u (reference utils.h:86-89)."""
    return (u >> 1) ^ -(u & 1)


def s2u_(s):
    """Sign-in-LSB map: u = 2|s| + (s<0). Reference utils.h:91-95.

    Load-bearing for block coding: u>>1 is the magnitude, u&1 the sign.
    """
    return (jnp.abs(s) << 1) | (s < 0).astype(s.dtype)


def u2s_(u):
    """Inverse of s2u_ (reference utils.h:97-101)."""
    mag = u >> 1
    return jnp.where((u & 1) != 0, -mag, mag)


def bitlen(v):
    """Bit length of a non-negative int: bitlen(0)=0, bitlen(1)=1, ...

    Reference utils.h:130-138. Uses the hardware count-leading-zeros.
    """
    v = v.astype(jnp.int32)
    return (32 - jax.lax.clz(v)).astype(jnp.int32)


def mult08(a):
    """Integer multiply-by-~0.8 via shifts (reference wavelet2d.cpp:307-318).

    a*(3/4)*(17/16)*(257/256) ~= 0.80008*a, with arithmetic-shift flooring at
    each stage. Exactness of each stage matters for transform invertibility
    parity, so this is replicated shift-for-shift.
    """
    a = a - (a >> 2)
    a = a + (a >> 4)
    return a + (a >> 8)


def wrap_int16(x):
    """Truncate int32 values to int16 two's-complement range (keep int32 dtype).

    Used by the int16-compat lifting mode for golden tests against the
    reference, whose `short` bands wrap at each assignment.
    """
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000
