"""4x4 block quantization, R/D coefficient kill, and zerotree significance.

TPU-native equivalent of reference CBandCodec::tsuqBlock/buildTree
(bandcodec.cpp:159-319). Everything here is block-parallel: the reference's
per-block insertion sort + kill loop becomes a 16-lane sort + suffix-AND,
and the fine->coarse subtree recursion becomes a per-level 2x2 pooling pass.

Semantics derived from the reference (see SURVEY.md §2 #4):
  * deadzone T = Q>>1; surviving coeffs map to s2u_ (sign-in-LSB) values
  * coeffs with u < rd_thres[0] are kill candidates; sorted descending, the
    smallest are zeroed while sorted[i] < rd_thres[i + n_direct]; survivors
    quantize to magnitude 1 (bandcodec.cpp:188-198)
  * a block is INSIGNIFICANT iff its whole quantized subtree is zero — the
    reference's "R/D pruning" returns the significant count, not a
    distortion (bandcodec.cpp:212 `return cnt`), so the zerotree is exactly
    the all-zero-subtree tree.

Design deviation: bands are zero-padded to multiples of 4 and all blocks are
treated uniformly; the reference's special bordered-block path
(bandcodec.cpp:215-237,405-478) disappears. Padded coefficients are zeros
and decode crops them away.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ric_tpu.config import BLK_SIZE
from ric_tpu.utils.bits import s2u_, bitlen


def pad4(band):
    """Zero-pad (H, W) to multiples of BLK_SIZE."""
    h, w = band.shape[-2:]
    ph = (-h) % BLK_SIZE
    pw = (-w) % BLK_SIZE
    if ph or pw:
        band = jnp.pad(band, [(0, 0)] * (band.ndim - 2) + [(0, ph), (0, pw)])
    return band


def to_blocks(band):
    """(H, W) -> (nby, nbx, 16) raster-ordered 4x4 blocks (H, W % 4 == 0)."""
    h, w = band.shape[-2:]
    nby, nbx = h // BLK_SIZE, w // BLK_SIZE
    x = band.reshape(band.shape[:-2] + (nby, BLK_SIZE, nbx, BLK_SIZE))
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(band.shape[:-2] + (nby, nbx, BLK_SIZE * BLK_SIZE))


def from_blocks(blocks, h: int, w: int):
    """Inverse of to_blocks, cropping to (h, w)."""
    nby, nbx = blocks.shape[-3], blocks.shape[-2]
    x = blocks.reshape(blocks.shape[:-3] + (nby, nbx, BLK_SIZE, BLK_SIZE))
    x = jnp.swapaxes(x, -3, -2)
    x = x.reshape(blocks.shape[:-3] + (nby * BLK_SIZE, nbx * BLK_SIZE))
    return x[..., :h, :w]


def quantize_blocks(band, quant: int, rd_thres: np.ndarray):
    """TSUQ + R/D kill over 4x4 blocks.

    band: (H, W) int32 coefficients (H, W multiples of 4).
    Returns (u, counts): u = s2u_-mapped quantized values (2*mag+sign, 0 if
    dead), counts = per-block significant count (nby, nbx).
    """
    blocks = to_blocks(band)  # (nby, nbx, 16)
    t = quant >> 1
    alive = jnp.abs(blocks) > t
    u = jnp.where(alive, s2u_(blocks), 0)

    thres0 = int(rd_thres[0])
    direct = alive & (u >= thres0)
    mag = u >> 1
    # exact rounded-division quantization of direct magnitudes
    q = (2 * mag + quant) // (2 * quant) if quant > 1 else mag

    if thres0 > 2:
        # Rank-based reformulation of "sort descending + suffix-AND kill"
        # (XLA 16-lane sorts serialize on TPU; a 16x16 stable-rank compare
        # matrix is pure VPU math). For candidate v at lane j:
        #   rank_j = #candidates sorting before j (stable descending)
        #   cond_j = v_j < rd_thres[rank_j + n_direct]   (its sorted-pos test)
        #   killed iff every candidate at rank >= rank_j fails-to-survive,
        #   i.e. rank_j > worst, worst = max rank with ~cond.
        cand = alive & ~direct
        n_direct = jnp.sum(direct, axis=-1, dtype=jnp.int32)  # (nby, nbx)
        cvals = jnp.where(cand, u, 0)
        lane = jnp.arange(16, dtype=jnp.int32)
        vk = cvals[..., :, None]   # candidate k (axis -2)
        vj = cvals[..., None, :]   # candidate j (axis -1)
        before = (vk > vj) | ((vk == vj) & (lane[:, None] < lane[None, :]))
        rank = jnp.sum(before, axis=-2, dtype=jnp.int32)  # (nby, nbx, 16)
        tidx = jnp.clip(rank + n_direct[..., None], 0, 15)
        tvec = jnp.zeros(tidx.shape, jnp.int32)
        for i in range(16):
            v = int(rd_thres[i])
            if v:
                tvec = jnp.where(tidx == i, jnp.int32(v), tvec)
        cond = cvals < tvec
        worst = jnp.max(
            jnp.where(cand & ~cond, rank, -1), axis=-1
        )  # (nby, nbx)
        survive = cand & (cvals > 0) & (rank <= worst[..., None])
        u_out = jnp.where(
            direct,
            (q << 1) | (u & 1),
            jnp.where(survive, 2 | (u & 1), 0),
        )
    else:
        u_out = jnp.where(direct, (q << 1) | (u & 1), 0)

    counts = jnp.sum(u_out != 0, axis=-1, dtype=jnp.int32)
    return u_out, counts


def pool_child_counts(child_sub, parent_grid):
    """Sum child subtree counts into the parent block grid (2x2 pooling).

    child_sub: (cby, cbx); parent_grid: (pby, pbx). Child blocks beyond
    2*parent grid have no parent and are cropped (they are coded
    unconditionally, see significance_masks).
    """
    pby, pbx = parent_grid
    c = child_sub[: 2 * pby, : 2 * pbx]
    c = jnp.pad(c, ((0, 2 * pby - c.shape[0]), (0, 2 * pbx - c.shape[1])))
    return c.reshape(pby, 2, pbx, 2).sum(axis=(1, 3))


def subtree_counts(counts):
    """counts: list finest-first of (nby, nbx) per-level block counts for one
    orientation. Returns same-shaped list of cumulative subtree counts."""
    sub = [None] * len(counts)
    sub[0] = counts[0]
    for l in range(1, len(counts)):
        sub[l] = counts[l] + pool_child_counts(sub[l - 1], counts[l].shape)
    return sub


def upsample_sig(parent_sig, child_grid):
    """Expand parent-block significance to the child block grid.

    Child blocks outside 2x parent grid have no parent: always alive
    (mirrors the reference's unconditional border coding,
    bandcodec.cpp:516-521,549-554).
    """
    cby, cbx = child_grid
    up = jnp.repeat(jnp.repeat(parent_sig, 2, axis=0), 2, axis=1)
    pad_y, pad_x = cby - up.shape[0], cbx - up.shape[1]
    if pad_y > 0 or pad_x > 0:
        up = jnp.pad(
            up,
            ((0, max(pad_y, 0)), (0, max(pad_x, 0))),
            constant_values=True,
        )
    return up[:cby, :cbx]


def parent_ctx(parent_u, child_grid):
    """Context = bitlen of max parent magnitude over the 2x2 parent coeff
    area covering each child block (reference maxLen, bandcodec.cpp:324-344);
    15 where no parent exists."""
    mags = parent_u >> 1
    h, w = mags.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    mags = jnp.pad(mags, ((0, ph - h), (0, pw - w)))
    pooled = mags.reshape(ph // 2, 2, pw // 2, 2).max(axis=(1, 3))
    ctx = jnp.minimum(bitlen(pooled), 15)
    cby, cbx = child_grid
    pad_y, pad_x = cby - ctx.shape[0], cbx - ctx.shape[1]
    if pad_y > 0 or pad_x > 0:
        ctx = jnp.pad(
            ctx, ((0, max(pad_y, 0)), (0, max(pad_x, 0))), constant_values=15
        )
    return ctx[:cby, :cbx]
