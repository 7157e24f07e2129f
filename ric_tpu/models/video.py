"""Video coding ops: quarter-pel interpolation bank, overlapped block motion
compensation, and batched motion estimation — TPU-native redesigns of
reference lib/image.cpp:280-342 (interH/interV), lib/imagebuffer.cpp:90-121
(calc_sub), lib/obmc.cpp (COBMC) and lib/obme.cpp (COBME::EPZS).

Design notes (vs the reference):
  * The 16 quarter-pel phase planes are built as one (4, 4, H, W) tensor by
    composing the two 4-tap integer kernels (same taps/rounding).
  * OBMC: every MV-grid node contributes one weighted 16x16 window at 8-px
    stride. The reference streams specialized edge/corner blends
    (obmc.cpp:102-250); here the MV grid is replicate-padded instead, which
    is arithmetically identical (a missing neighbor's window would sample
    the same prediction), and the accumulation becomes four shifted
    quadrant adds — no scatter.
  * Motion estimation: the reference's EPZS scans blocks serially so each
    block's predictor uses final neighbor MVs (obme.cpp:185-222). That
    dependency is re-architected as Jacobi iterations: every round, all
    blocks test (in parallel) their own MV, their 4 neighbors' previous-
    round MVs, zero, and small diamond offsets; a final half+quarter-pel
    refinement searches the phase bank. Blocks whose best SAD exceeds the
    intra threshold become MV_INTRA (contribute zero prediction).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

INTRA_THRES = 65535  # reference THRES_D (obme.cpp:137)
MV_INTRA = jnp.int32(-(1 << 30))  # sentinel in our (y, x) int fields


# --------------------------------------------------------------------------
# Quarter-pel interpolation bank (image.cpp:280-342, imagebuffer.cpp:90-121)
# --------------------------------------------------------------------------


def _interp_1d(x, pos: int, axis: int):
    """4-tap phase interpolation along axis with replicate borders."""
    if pos == 0:
        return x
    x = jnp.moveaxis(x, axis, -1)
    pad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 2)], mode="edge")
    a = pad[..., 0:-3]   # in[i-1]
    b = pad[..., 1:-2]   # in[i]
    c = pad[..., 2:-1]   # in[i+1]
    d = pad[..., 3:]     # in[i+2]
    if pos == 1:
        out = (53 * b + 18 * c - 4 * a - 3 * d + 32) >> 6
    elif pos == 2:
        out = ((b + c) * 9 - a - d + 8) >> 4
    else:
        out = (18 * b + 53 * c - 3 * a - 4 * d + 32) >> 6
    return jnp.moveaxis(out, -1, axis)


def subpel_bank(ref):
    """(H, W) int32 -> (4, 4, H, W): bank[px][py] = interV<py>(interH<px>).

    Matches calc_sub's plane order pic = ((x&3)<<2)|(y&3)
    (obmc.cpp:252-332): index [px, py].
    """
    planes = []
    for px in range(4):
        h = _interp_1d(ref, px, axis=-1)
        col = [_interp_1d(h, py, axis=-2) for py in range(4)]
        planes.append(jnp.stack(col, axis=0))
    return jnp.stack(planes, axis=0)


# --------------------------------------------------------------------------
# OBMC (obmc.cpp:56-332)
# --------------------------------------------------------------------------

_W8 = np.array(
    [
        [0, 0, 0, 0, 1, 1, 1, 1],
        [0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 1, 2, 2, 3, 4, 4],
        [0, 1, 2, 3, 4, 5, 6, 6],
        [1, 1, 2, 4, 5, 7, 8, 9],
        [1, 2, 3, 5, 7, 9, 9, 11],
        [1, 2, 4, 6, 8, 9, 12, 13],
        [1, 2, 4, 6, 9, 11, 13, 14],
    ],
    np.int32,
)
# full 16x16 raised-cosine-ish window by quadrant mirroring (obmc.cpp:85-95)
W16 = np.empty((16, 16), np.int32)
W16[:8, :8] = _W8
W16[:8, 8:] = _W8[:, ::-1]
W16[8:, :] = W16[:8][::-1]


def _gather_patches(bank, mvy, mvx, psize: int, stride: int, off: int):
    """Gather (gy, gx, psize, psize) patches from the phase bank.

    Node (j, i) samples phase plane (mvx&3, mvy&3) at integer offset
    (stride*j + off + mvy>>2, stride*i + off + mvx>>2), clipped to the
    frame (reference CHECK_MV clips to [-7, dim-1], we clip per-pixel).
    """
    h, w = bank.shape[-2:]
    gy, gx = mvy.shape
    py = mvy & 3
    px = mvx & 3
    oy = (stride * jnp.arange(gy, dtype=jnp.int32)[:, None] + off) + (mvy >> 2)
    ox = (stride * jnp.arange(gx, dtype=jnp.int32)[None, :] + off) + (mvx >> 2)
    dy = jnp.arange(psize, dtype=jnp.int32)
    rows = jnp.clip(oy[..., None] + dy, 0, h - 1)  # (gy, gx, p)
    cols = jnp.clip(ox[..., None] + dy, 0, w - 1)
    flat = bank.reshape(4, 4, h, w)
    return flat[
        px[..., None, None], py[..., None, None],
        rows[..., :, None], cols[..., None, :],
    ]


def _obmc_wpatch(bank, mvy, mvx, skip):
    """Weighted 16x16 windows for each (padded) grid node; `skip` nodes
    contribute zero."""
    def pad_grid(a):
        return jnp.pad(a, ((1, 1), (1, 1)), mode="edge")

    mvy_p, mvx_p = pad_grid(mvy), pad_grid(mvx)
    skip_p = pad_grid(skip)
    mvy_p = jnp.where(skip_p, 0, mvy_p)
    mvx_p = jnp.where(skip_p, 0, mvx_p)
    patches = _gather_patches(bank, mvy_p, mvx_p, 16, 8, -12)
    patches = jnp.where(skip_p[..., None, None], 0, patches)
    return patches * jnp.asarray(W16)  # (gy+2, gx+2, 16, 16)


def _obmc_normalize(wpatch, gy, gx, height, width):
    """Quadrant-add accumulation + /16 rounding of the window lattice."""
    q = wpatch.reshape(gy + 2, gx + 2, 2, 8, 2, 8).transpose(0, 2, 1, 4, 3, 5)
    # q[j, a, i, b]: quadrant (a, b) of node (j, i)
    acc = (
        q[:-1, 1, :-1, 1] + q[:-1, 1, 1:, 0] + q[1:, 0, :-1, 1] + q[1:, 0, 1:, 0]
    )  # (gy+1, gx+1, 8, 8)
    out = acc.transpose(0, 2, 1, 3).reshape((gy + 1) * 8, (gx + 1) * 8)
    out = (out + 8) >> 4
    # padded lattice starts at pixel -4
    return out[4 : 4 + height, 4 : 4 + width]


def obmc_predict(bank, mvy, mvx, intra, height: int, width: int):
    """Overlapped-block prediction. mvy/mvx: (gy, gx) quarter-pel ints with
    grid stride 8; intra: (gy, gx) bool. Returns (height, width) int32."""
    gy, gx = mvy.shape
    wpatch = _obmc_wpatch(bank, mvy, mvx, intra)
    return _obmc_normalize(wpatch, gy, gx, height, width)


# --------------------------------------------------------------------------
# Motion estimation (obme.cpp re-architected)
# --------------------------------------------------------------------------


def _sad_int(cur_blocks, ref, mvy, mvx):
    """SAD of 8x8 blocks vs integer-pel displaced reference.
    cur_blocks: (gy, gx, 8, 8); mv in integer pixels."""
    h, w = ref.shape
    gy, gx = mvy.shape
    oy = 8 * jnp.arange(gy, dtype=jnp.int32)[:, None] + mvy
    ox = 8 * jnp.arange(gx, dtype=jnp.int32)[None, :] + mvx
    d = jnp.arange(8, dtype=jnp.int32)
    rows = jnp.clip(oy[..., None] + d, 0, h - 1)
    cols = jnp.clip(ox[..., None] + d, 0, w - 1)
    patch = ref[rows[..., :, None], cols[..., None, :]]
    sad = jnp.sum(jnp.abs(patch - cur_blocks), axis=(-2, -1))
    return jnp.minimum(sad, 65535)


def _sad_qpel(cur_blocks, bank, mvy, mvx):
    """SAD vs quarter-pel displaced reference from the phase bank."""
    patch = _gather_patches(bank, mvy, mvx, 8, 8, 0)
    sad = jnp.sum(jnp.abs(patch - cur_blocks), axis=(-2, -1))
    return jnp.minimum(sad, 65535)


_DIAMOND = [(0, 1), (0, -1), (1, 0), (-1, 0)]


def motion_search_sad(cur, ref, bank, prev_mvy=None, prev_mvx=None,
                      steps=(8, 4, 2, 1, 1, 1)):
    """Like motion_search but also returns the best quarter-pel SAD map
    (used by multi-reference selection)."""
    h, w = cur.shape
    gy, gx = h // 8, w // 8
    cur_blocks = cur.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3)

    mvy = jnp.zeros((gy, gx), jnp.int32) if prev_mvy is None else (prev_mvy + 2) >> 2
    mvx = jnp.zeros((gy, gx), jnp.int32) if prev_mvx is None else (prev_mvx + 2) >> 2
    best = _sad_int(cur_blocks, ref, mvy, mvx)

    def consider(best, mvy, mvx, cy, cx):
        s = _sad_int(cur_blocks, ref, cy, cx)
        better = s < best
        return (jnp.where(better, s, best), jnp.where(better, cy, mvy),
                jnp.where(better, cx, mvx))

    for step in steps:
        # neighbor candidates (previous-round values) + zero + scaled diamond
        cands = []
        for sy, sx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            cands.append(
                (jnp.roll(mvy, (sy, sx), (0, 1)), jnp.roll(mvx, (sy, sx), (0, 1)))
            )
        cands.append((jnp.zeros_like(mvy), jnp.zeros_like(mvx)))
        for dy, dx in _DIAMOND + [(1, 1), (1, -1), (-1, 1), (-1, -1)]:
            cands.append((mvy + dy * step, mvx + dx * step))
        for cy, cx in cands:
            best, mvy, mvx = consider(best, mvy, mvx, cy, cx)

    # subpel refinement: half then quarter (obme.cpp:110-132,224-243)
    mvy = mvy << 2
    mvx = mvx << 2
    best = _sad_qpel(cur_blocks, bank, mvy, mvx)
    for level in (1, 0):
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            cy = mvy + (dy << level)
            cx = mvx + (dx << level)
            s = _sad_qpel(cur_blocks, bank, cy, cx)
            better = s < best
            best = jnp.where(better, s, best)
            mvy = jnp.where(better, cy, mvy)
            mvx = jnp.where(better, cx, mvx)

    return mvy, mvx, best


def motion_search(cur, ref, bank, prev_mvy=None, prev_mvx=None,
                  steps=(8, 4, 2, 1, 1, 1), intra_thres: int = INTRA_THRES):
    """Batched iterative motion search. cur/ref: (H, W) int32 (H, W % 8 == 0).

    Returns (mvy, mvx, intra): quarter-pel MVs (gy, gx) and intra mask.
    """
    mvy, mvx, best = motion_search_sad(cur, ref, bank, prev_mvy, prev_mvx,
                                       steps)
    return mvy, mvx, best >= intra_thres


def motion_search_multi(cur, refs, banks, intra_thres: int = INTRA_THRES):
    """Multi-reference search over a ring of R recon frames (the reference
    CImageBuffer keeps such a ring and COBME carries per-block `ref`
    fields, imagebuffer.h:28, obme.h:30 — never driven past R=1 there).

    refs: (R, H, W); banks: (R, 4, 4, H, W). Returns (mvy, mvx, refidx,
    intra): per 8x8 block the best (vector, reference) pair by SAD.
    """
    R = refs.shape[0]
    mvy = mvx = refidx = best = None
    for r in range(R):
        my, mx, b = motion_search_sad(cur, refs[r], banks[r])
        if best is None:
            mvy, mvx, best = my, mx, b
            refidx = jnp.zeros(my.shape, jnp.int32)
        else:
            better = b < best
            mvy = jnp.where(better, my, mvy)
            mvx = jnp.where(better, mx, mvx)
            refidx = jnp.where(better, r, refidx)
            best = jnp.where(better, b, best)
    return mvy, mvx, refidx, best >= intra_thres


def obmc_predict_multi(banks, mvy, mvx, refidx, intra, height: int,
                       width: int):
    """OBMC over a bank ring: each grid node samples the phase bank of its
    selected reference frame; the window accumulation and the single /16
    normalization happen after summing all refs' weighted patches (one
    blend, identical rounding to single-ref). banks: (R, 4, 4, H, W)."""
    R = banks.shape[0]
    gy, gx = mvy.shape
    wpatch = None
    for r in range(R):
        wp = _obmc_wpatch(banks[r], mvy, mvx, intra | (refidx != r))
        wpatch = wp if wpatch is None else wpatch + wp
    return _obmc_normalize(wpatch, gy, gx, height, width)
