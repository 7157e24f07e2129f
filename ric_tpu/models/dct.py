"""8x8 integer binDCT-L3 with lapped pre/post filters — vectorized.

TPU-native equivalent of reference lib/dct2d.{h,cpp} + bindct.h (the
"DCT/geometric intra" capability; orphaned in the reference build but part
of its surface). All butterflies/lifting steps are whole-tensor ops over
every 8x8 block at once.

Scaling convention (matches the reference): the plain butterflies are
(a+b, a-b) in both directions, so idct(dct(x)) == 16*x + O(1) rounding in
2-D. The x16 gain is folded into quantization — the encode step is a
multiple of 16 (dct2d.cpp:336 `& (-1<<4)`) while dequantization uses
step>>4 (dct2d.cpp:368) — so quant->dequant->idct reconstructs pixels.
The lapped pre/post filters by contrast ARE exact integer inverses.

Lifting constants (bindct.h:29-36, binDCT-L3 from Tran's binDCT paper):
  P1=7/16 U1=3/8 P2=1/4 U2=9/16 P3=5/16 P4=1/8 U3=3/16 P5=3/32
Pre/post filters operate on 8-pixel spans straddling block boundaries
(dct2d.cpp:227-316, Tran's prepost paper).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# lifting helpers (bindct.h:29-36); arithmetic shifts on int32


def _p1(a):
    return (a >> 1) - (a >> 4)


def _u1(a):
    return (a >> 1) - (a >> 3)


def _p2(a):
    return a >> 2


def _u2(a):
    return (a >> 1) + (a >> 4)


def _p3(a):
    return (a >> 2) + (a >> 4)


def _p4(a):
    return a >> 3


def _u3(a):
    return (a >> 2) - (a >> 4)


def _p5(a):
    return (a >> 3) - (a >> 5)


def _dct8(v):
    """Forward binDCT-L3 over a list of 8 same-shaped arrays
    (dct2d.cpp:32-68). Returns the transformed list."""
    x = list(v)

    def bfly(a, b):
        return a + b, a - b

    x[0], x[7] = bfly(x[0], x[7])
    x[1], x[6] = bfly(x[1], x[6])
    x[2], x[5] = bfly(x[2], x[5])
    x[3], x[4] = bfly(x[3], x[4])

    x[0], x[3] = bfly(x[0], x[3])
    x[1], x[2] = bfly(x[1], x[2])

    x[0] = x[0] + x[1]
    x[1] = x[1] - (x[0] >> 1)

    x[2] = x[2] - _p1(x[3])
    x[3] = x[3] - _u1(x[2])

    x[7] = x[7] - _p2(x[4])
    x[4] = x[4] + _u2(x[7])
    x[7] = x[7] - _p3(x[4])

    x[6] = x[6] - _p4(x[5])
    x[5] = x[5] + _u3(x[6])
    x[6] = x[6] - _p5(x[5])

    x[4], x[6] = bfly(x[4], x[6])
    x[7], x[5] = bfly(x[7], x[5])

    x[7] = x[7] + x[4]
    x[4] = x[4] - (x[7] >> 1)
    return x


def _idct8(v):
    """Exact inverse of _dct8 (dct2d.cpp:109-145)."""
    x = list(v)

    def bfly(a, b):
        return a + b, a - b

    x[4] = x[4] + (x[7] >> 1)
    x[7] = x[7] - x[4]

    x[4], x[6] = bfly(x[4], x[6])
    x[7], x[5] = bfly(x[7], x[5])

    x[6] = x[6] + _p5(x[5])
    x[5] = x[5] - _u3(x[6])
    x[6] = x[6] + _p4(x[5])

    x[7] = x[7] + _p3(x[4])
    x[4] = x[4] - _u2(x[7])
    x[7] = x[7] + _p2(x[4])

    x[3] = x[3] + _u1(x[2])
    x[2] = x[2] + _p1(x[3])

    x[1] = x[1] + (x[0] >> 1)
    x[0] = x[0] - x[1]

    x[0], x[3] = bfly(x[0], x[3])
    x[1], x[2] = bfly(x[1], x[2])

    x[0], x[7] = bfly(x[0], x[7])
    x[1], x[6] = bfly(x[1], x[6])
    x[2], x[5] = bfly(x[2], x[5])
    x[3], x[4] = bfly(x[3], x[4])
    return x


def _apply_axis8(x, axis, fn):
    """Apply an 8-vector lifting chain along `axis` (length multiple of 8)."""
    x = jnp.moveaxis(x, axis, -1)
    shp = x.shape
    x = x.reshape(shp[:-1] + (shp[-1] // 8, 8))
    parts = [x[..., i] for i in range(8)]
    parts = fn(parts)
    x = jnp.stack(parts, axis=-1)
    x = x.reshape(shp)
    return jnp.moveaxis(x, -1, axis)


def dct2d_blocks(x):
    """Forward 8x8 blocked binDCT of (..., H, W) int32 (H, W % 8 == 0).
    Column pass then row pass (dct2d.cpp:203-204)."""
    x = _apply_axis8(x, -2, _dct8)
    return _apply_axis8(x, -1, _dct8)


def idct2d_blocks(x):
    x = _apply_axis8(x, -1, _idct8)
    return _apply_axis8(x, -2, _idct8)


def _pre_filter(v):
    """Lapped pre-filter over an 8-span straddling a block boundary
    (dct2d.cpp:233-252)."""
    x = list(v)

    def bfly_fwd(a, b):
        b = a - b
        return a - (b >> 1), b

    def bfly_inv(a, b):
        a = a + (b >> 1)
        return a, a - b

    x[0], x[7] = bfly_fwd(x[0], x[7])
    x[1], x[6] = bfly_fwd(x[1], x[6])
    x[2], x[5] = bfly_fwd(x[2], x[5])
    x[3], x[4] = bfly_fwd(x[3], x[4])

    x[7] = x[7] - (x[6] >> 1)
    x[6] = x[6] + x[7] - (x[7] >> 2) - (x[5] >> 2)
    x[5] = x[5] + (x[6] >> 1)
    x[4] = x[4] + (x[5] >> 2)

    x[0], x[7] = bfly_inv(x[0], x[7])
    x[1], x[6] = bfly_inv(x[1], x[6])
    x[2], x[5] = bfly_inv(x[2], x[5])
    x[3], x[4] = bfly_inv(x[3], x[4])
    return x


def _post_filter(v):
    """Inverse of the lapped pre-filter (dct2d.cpp:243-248)."""
    x = list(v)

    def bfly_fwd(a, b):
        b = a - b
        return a - (b >> 1), b

    def bfly_inv(a, b):
        a = a + (b >> 1)
        return a, a - b

    x[0], x[7] = bfly_fwd(x[0], x[7])
    x[1], x[6] = bfly_fwd(x[1], x[6])
    x[2], x[5] = bfly_fwd(x[2], x[5])
    x[3], x[4] = bfly_fwd(x[3], x[4])

    x[4] = x[4] - (x[5] >> 2)
    x[5] = x[5] - (x[6] >> 1)
    x[6] = x[6] - (x[7] - (x[7] >> 2) - (x[5] >> 2))
    x[7] = x[7] + (x[6] >> 1)

    x[0], x[7] = bfly_inv(x[0], x[7])
    x[1], x[6] = bfly_inv(x[1], x[6])
    x[2], x[5] = bfly_inv(x[2], x[5])
    x[3], x[4] = bfly_inv(x[3], x[4])
    return x


def _lap_axis(x, axis, fn):
    """Apply the boundary filter chain to 8-spans at offset 4 along axis
    (interior block boundaries only, dct2d.cpp:292-316)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    core = x[..., 4 : n - 4]
    shp = core.shape
    core = core.reshape(shp[:-1] + (shp[-1] // 8, 8))
    parts = [core[..., i] for i in range(8)]
    parts = fn(parts)
    core = jnp.stack(parts, axis=-1).reshape(shp)
    x = jnp.concatenate([x[..., :4], core, x[..., n - 4 :]], axis=-1)
    return jnp.moveaxis(x, -1, axis)


def lapped_pre(x):
    """Pre-filter across all interior block boundaries: vertical spans then
    horizontal spans (the reference's per-band interleaving reduces to this
    order because disjoint filters commute)."""
    x = _lap_axis(x, -2, _pre_filter)
    return _lap_axis(x, -1, _pre_filter)


def lapped_post(x):
    """Exact inverse of lapped_pre: horizontal spans undone first (the
    reference reuses the same V-then-H loop for both directions,
    dct2d.cpp:292-316, which leaves O(1) corner drift; we invert in strict
    reverse order instead)."""
    x = _lap_axis(x, -1, _post_filter)
    return _lap_axis(x, -2, _post_filter)


# per-frequency norms (dct2d.cpp:323)
NORM = np.array(
    [0.353553391, 0.707106781, 0.461939766, 0.5411961,
     0.707106781, 0.5, 0.5, 0.353553391], np.float32
)


def dct_quant_table(q: int) -> np.ndarray:
    """Per-frequency quant steps from a base quantizer STEP (the
    reference's dct2d.cpp:332-339 shape; callers pass the working-domain
    step, e.g. quant_step(q_index + SHIFT*5) — calibrated so the DCT
    profile's PSNR tracks the wavelet profile at the same -q index)."""
    tab = np.empty((8, 8), np.int32)
    for j in range(8):
        for i in range(8):
            tab[j, i] = (int(np.float32(q) / (NORM[i] * NORM[j])) + 8) & ~15
    return np.maximum(tab, 16)


def tsuq_dct(coeffs, quant: int):
    """Deadzone quantize blocked DCT coeffs with per-frequency steps.
    coeffs: (..., H, W) with 8x8 block structure."""
    tab = dct_quant_table(quant)
    h, w = coeffs.shape[-2:]
    tab_full = jnp.asarray(np.tile(tab, (h // 8, w // 8)), jnp.int32)
    t = tab_full >> 1
    dead = jnp.abs(coeffs) <= t
    q = jnp.sign(coeffs) * ((2 * jnp.abs(coeffs) + tab_full) // (2 * tab_full))
    return jnp.where(dead, 0, q)


def tsuq_dct_inverse(q, quant: int):
    """Dequantize with step>>4, folding in the 1/16 transform gain
    (dct2d.cpp:364-377)."""
    tab = dct_quant_table(quant)
    h, w = q.shape[-2:]
    tab_full = jnp.asarray(np.tile(tab >> 4, (h // 8, w // 8)), jnp.int32)
    return q * tab_full
