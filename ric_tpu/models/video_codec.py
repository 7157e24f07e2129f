"""Video codec orchestration — TPU-native CRududuCodec
(reference lib/rududucodec.{h,cpp}).

GOP structure: an intra frame every `gop` frames (reference key_count,
rududucodec.cpp:110-112); P-frames run motion search against the previous
*reconstruction*, OBMC prediction, 3-level cdf97 residual coding with the
video quantizer ladder (rududucodec.cpp:58-65: residual quant index
quant+20, lambda index quant+12), and in-loop reconstruction by decoding
the just-encoded residual stream (encoder and decoder share the exact
decode path, so drift is impossible by construction — the reference gets
the same property from its templated encode/decode code sharing).

Color: like the reference (rududucodec.cpp:67-76 loops components), every
frame codes all planes (Y, Cg, Co after the reversible YCoCg transform);
motion is estimated on the luma reconstruction (COBME::EPZS SADs component
0, obme.cpp:74) and applied to every plane through its own quarter-pel
bank (imagebuffer calc_sub builds banks per component).

The whole per-frame pipeline is ONE jitted device graph: DWT + entropy
encode, the device-side stream rewire, and the in-loop decode + OBMC
prediction all fuse; only the finished stream words and the (tiny) MV
field cross to the host, where the MV field is serial range coded and the
container assembled.

MV fields are median-predictor coded (RTV1 v4; see _mv_predict): per node
an intra flag and a zero-residual flag, then per component a residual
size class (adaptive serial model) and size-1 refinement bits — tiny
substream whose decode-side reconstruction recurrence runs in the native
runtime.

Container RTV1 v4: per-frame (ftype, mv, per-plane residual A/B)
substreams.
"""
from __future__ import annotations

import functools
import struct

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec, video
from ric_tpu.ops import bitpack
from ric_tpu.utils.bits import s2u_, u2s_, bitlen

VIDEO_LEVELS = 3  # rududucodec.cpp:26
GOP_DEFAULT = 10
_VQ = (32768, 37641, 43238, 49667, 57052)


def video_quant_step(idx: int) -> int:
    """Reference CRududuCodec::quants (rududucodec.cpp:58-65)."""
    if idx == 0:
        return 0
    idx -= 1
    r = 10 - idx // 5
    return (_VQ[idx % 5] + (1 << (r - 1))) >> r


def _frame_cfg(w: int, h: int, quant: int) -> CodecConfig:
    return CodecConfig(
        width=w, height=h, quant=min(max(quant, 0), 31),
        transform=Transform.CDF97, levels=VIDEO_LEVELS,
        q_step=video_quant_step(quant + 20) if quant else 0,
        lam_step=video_quant_step(quant + 12) if quant else 0,
    )


# --------------------------------------------------------------------------
# MV field coding (replaces reference COBMC::encode/decode, obmc.cpp:344-440)
# --------------------------------------------------------------------------


# Serial-coder model seeds: table 0 = intra flag (skewed to inter), table
# 1/2 = size classes of the y/x median-predictor residuals (skewed to 0),
# table 3 = reference index (skewed to the most recent frame), table 4 =
# zero-residual flag (skewed to zero: after median prediction most inter
# vectors match their neighborhood).
_MV_SEED = np.zeros((5, 32), np.int32)
_MV_SEED[0, :2] = (230, 26)
for _t in (1, 2):
    _MV_SEED[_t, :16] = np.maximum((256 * 0.5 ** np.arange(16)).astype(int), 1)
_MV_SEED[3, :8] = np.maximum((256 * 0.35 ** np.arange(8)).astype(int), 1)
_MV_SEED[4, :2] = (180, 76)


def _mv_predict(comp):
    """Vectorized per-position median predictors over a (lossless-coded)
    MV component: row 0 takes the left neighbor, first/last columns take
    up, interior takes median(left, up, upright). The ENCODER evaluates
    this in parallel (original == decoded for lossless MV coding); the
    decoder reruns the same rule as a raster recurrence in the native
    runtime (ric_native.cpp ric_mv_recon). Median prediction replaced the
    2-D gradient in RTV1 v4: measured on 720p synthetic global motion the
    gradient residuals cost 1.33x the reference's MV coder (obmc.cpp:
    344-440) while median residuals cost 1.07x (tools/testmotion.py)."""
    gy, gx = comp.shape
    z = jnp.zeros((gy, 1), comp.dtype)
    left = jnp.concatenate([z, comp[:, :-1]], axis=1)
    up = jnp.concatenate([jnp.zeros((1, gx), comp.dtype), comp[:-1]], axis=0)
    ur = jnp.concatenate(
        [jnp.zeros((1, gx), comp.dtype),
         jnp.concatenate([comp[:-1, 1:], comp[:-1, -1:]], axis=1)], axis=0)
    med = jnp.maximum(jnp.minimum(jnp.maximum(left, up), ur),
                      jnp.minimum(left, up))
    ii = jnp.arange(gx)[None, :]
    jj = jnp.arange(gy)[:, None]
    p = jnp.where((ii == 0) | (ii == gx - 1), up, med)
    return jnp.where(jj == 0, left, p)


def _mv_symbols(mvy, mvx, intra):
    """(symbols, tids, acts, refinement vals/lens) for one MV field."""
    inter = ~intra
    my = jnp.where(intra, 0, mvy)
    mx = jnp.where(intra, 0, mvx)
    dy = my - _mv_predict(my)
    dx = mx - _mv_predict(mx)
    zero = (dy == 0) & (dx == 0)
    nz = (inter & ~zero).ravel()
    n = intra.size
    syms = [intra.astype(jnp.int32).ravel(), zero.astype(jnp.int32).ravel()]
    tids = [jnp.zeros(n, jnp.int32), jnp.full(n, 4, jnp.int32)]
    acts = [np.ones(n, np.uint8), np.asarray(inter.ravel(), np.uint8)]
    rvals, rlens = [], []
    for t, d in ((1, dy), (2, dx)):
        u = s2u_(jnp.where(nz.reshape(d.shape), d, 0))
        s = bitlen(u)
        refv = u - jnp.where(s > 0, jnp.int32(1) << jnp.maximum(s - 1, 0), 0)
        syms.append(s.ravel())
        tids.append(jnp.full(n, t, jnp.int32))
        acts.append(np.asarray(nz, np.uint8))
        rvals.append(refv.ravel())
        rlens.append(jnp.where(s > 0, s - 1, 0).ravel())
    return syms, tids, acts, rvals, rlens


def encode_mv(mvy, mvx, intra, refidx=None) -> bytes:
    """Median-predictor MV field coding (RTV1 v4): adaptive serial range
    coding of (intra flag, zero flag, residual size classes, ref indices)
    via the native C++ backend, refinement bits raw-packed; the two parts
    concatenate with a u32 length prefix."""
    from ric_tpu.utils import native

    n = intra.size
    syms, tids, acts, rvals, rlens = _mv_symbols(mvy, mvx, intra)
    if refidx is not None:
        syms.append(jnp.where(intra, 0, refidx).ravel())
        tids.append(jnp.full(n, 3, jnp.int32))
        acts.append(np.asarray(~np.asarray(intra).ravel(), np.uint8))
    enc = native.SerialEncoder(_MV_SEED)
    enc.put(
        np.concatenate([np.asarray(s) for s in syms]),
        np.concatenate([np.asarray(t) for t in tids]),
        np.concatenate(acts),
    )
    rc = enc.finish()
    words, total = bitpack.pack(
        jnp.concatenate(rvals), jnp.concatenate(rlens), (n * 30) // 32 + 4
    )
    raw = image_codec.words_to_bytes(words, int(total))
    return struct.pack("<I", len(rc)) + rc + raw


def decode_mv(data: bytes, gy: int, gx: int, n_refs: int = 1):
    from ric_tpu.utils import native

    n = gy * gx
    (lrc,) = struct.unpack("<I", data[:4])
    rc = data[4 : 4 + lrc]
    raw = data[4 + lrc :]
    dec = native.SerialDecoder(_MV_SEED, rc)
    intra = dec.get(np.zeros(n, np.int32), np.ones(n, np.uint8))
    inter = (intra == 0).astype(np.uint8)
    zero = dec.get(np.full(n, 4, np.int32), inter)
    nz = (inter & (zero == 0)).astype(np.uint8)
    sy = dec.get(np.full(n, 1, np.int32), nz)
    sx = dec.get(np.full(n, 2, np.int32), nz)
    refidx = np.zeros(n, np.int32)
    if n_refs > 1:
        refidx = dec.get(np.full(n, 3, np.int32), inter)
    dec.close()
    words = jnp.asarray(image_codec.bytes_to_words(raw, (n * 30) // 32 + 4))
    base = jnp.int32(0)
    comps = []
    for s in (sy, sx):
        s = jnp.asarray(s)
        lens = jnp.where(s > 0, s - 1, 0)
        offs, total = bitpack.excl_cumsum(lens)
        refv = bitpack.unpack(words, base + offs, lens).astype(jnp.int32)
        base = base + total
        u = jnp.where(
            s > 0, (jnp.int32(1) << jnp.maximum(s - 1, 0)) | refv, 0
        )
        comps.append(np.asarray(u2s_(u)).reshape(gy, gx))
    mvy, mvx = native.mv_recon(comps[0], comps[1], intra.reshape(gy, gx))
    return (jnp.asarray(mvy), jnp.asarray(mvx),
            jnp.asarray(intra.reshape(gy, gx) == 1),
            jnp.asarray(refidx.reshape(gy, gx)))


# --------------------------------------------------------------------------
# Fused frame pipeline (device graphs, built once per (w, h, quant, color))
# --------------------------------------------------------------------------


def _stream_caps(cfg: CodecConfig):
    plans, _ = image_codec.make_plane_plans(cfg, False)
    L = image_codec._lanes(cfg)
    capA = image_codec._cap_words_a(cfg)
    cap16 = image_codec._cap_words16(plans, L) + L + 8
    return L, capA, cap16


def _make_rewire(L: int, cap16: int):
    """Device-side stream rewire: the encoder's B words -> decoder inputs
    (lane states + u16 word stream), no host round trip."""

    def rewire(wB):
        # wB is uint16 wire layout: [2L state halves][u16 words]
        states = jax.lax.bitcast_convert_type(
            wB[: 2 * L].reshape(L, 2), jnp.uint32)
        body = wB[2 * L :].astype(jnp.uint32)
        s16 = jnp.zeros((cap16,), jnp.uint32)
        s16 = s16.at[: body.shape[0]].set(body[:cap16])
        return states, s16

    return rewire


@functools.lru_cache(maxsize=8)
def _frame_fns(w: int, h: int, quant: int, channels: int, n_refs: int = 1):
    """Jitted per-frame device graphs: (key_enc, p_enc, key_dec, p_dec).

    Encode fns return per-plane stream stacks plus the updated
    reconstruction ring; decode fns mirror them from parsed stream arrays.
    Planes: (C, H, W) working-domain int32 (YCoCg<<4 or gray<<4); the
    recon ring is (R, C, H, W), newest frame first (the CImageBuffer
    multi-frame ring, imagebuffer.h:28 — with per-block reference
    selection when R > 1).
    """
    cfg = _frame_cfg(w, h, quant)
    enc = image_codec.build_encode_plane(cfg, chroma=False)
    dec = image_codec.build_decode_plane(cfg, chroma=False)
    L, capA, cap16 = _stream_caps(cfg)
    rewire = _make_rewire(L, cap16)
    C, R = channels, n_refs

    def _enc_recon(x):
        """Encode planes and decode them back in-graph (in-loop recon)."""
        outs = [enc(x[c]) for c in range(C)]
        recs = []
        for wA, tA, wB, tB in outs:
            states, s16 = rewire(wB)
            recs.append(dec(wA, states, s16))
        wAs = jnp.stack([o[0] for o in outs])
        tAs = jnp.stack([o[1] for o in outs])
        wBs = jnp.stack([o[2] for o in outs])
        tBs = jnp.stack([o[3] for o in outs])
        return wAs, tAs, wBs, tBs, jnp.stack(recs)

    def _push(ring, recon):
        return jnp.concatenate([recon[None], ring[:-1]], axis=0)

    def key_enc(x):
        wAs, tAs, wBs, tBs, recon = _enc_recon(x)
        # a key frame resets the ring: every slot holds the key recon
        ring = jnp.broadcast_to(recon[None], (R,) + recon.shape)
        return wAs, tAs, wBs, tBs, ring

    def _predict(ring, mvy, mvx, refidx, intra):
        preds = []
        for c in range(C):
            banks = jnp.stack(
                [video.subpel_bank(ring[r, c]) for r in range(R)])
            preds.append(video.obmc_predict_multi(
                banks, mvy, mvx, refidx, intra, h, w))
        return jnp.stack(preds)

    def p_enc(x, ring):
        banks_y = jnp.stack(
            [video.subpel_bank(ring[r, 0]) for r in range(R)])
        mvy, mvx, refidx, intra = video.motion_search_multi(
            x[0], ring[:, 0], banks_y)
        pred = _predict(ring, mvy, mvx, refidx, intra)
        wAs, tAs, wBs, tBs, res_rec = _enc_recon(x - pred)
        ring = _push(ring, pred + res_rec)
        return wAs, tAs, wBs, tBs, ring, mvy, mvx, refidx, intra

    def key_dec(wAs, states, s16s):
        recon = jnp.stack(
            [dec(wAs[c], states[c], s16s[c]) for c in range(C)])
        return jnp.broadcast_to(recon[None], (R,) + recon.shape)

    def p_dec(wAs, states, s16s, mvy, mvx, refidx, intra, ring):
        pred = _predict(ring, mvy, mvx, refidx, intra)
        res = jnp.stack([dec(wAs[c], states[c], s16s[c]) for c in range(C)])
        return _push(ring, pred + res)

    return (jax.jit(key_enc), jax.jit(p_enc), jax.jit(key_dec),
            jax.jit(p_dec))


def _planes_from_frame(frame, channels: int):
    """uint8 frame -> (C, H, W) working-domain int32 planes."""
    x = jnp.asarray(frame, jnp.int32)
    if channels == 3:
        y, co, cg = image_codec.rgb_to_ycocg(x, 4)
        return jnp.stack([y, cg, co])
    return ((x - 128) << 4)[None]


def _frame_to_pixels(recon, channels: int):
    if channels == 3:
        rgb = image_codec.ycocg_to_rgb(recon[0], recon[2], recon[1], 4)
        return np.asarray(rgb).astype(np.uint8)
    out = jnp.clip(128 + ((recon[0] + 8) >> 4), 0, 255)
    return np.asarray(out).astype(np.uint8)


def frame_to_yv12(recon) -> bytes:
    """Color recon planes -> one YV12 frame (Y then V then U planes, 2x2
    chroma subsampling), like the reference testmotion output
    (testmotion.cpp:61-62 via CImage::outputYV12)."""
    y, v, u = image_codec.ycocg_to_yv12(recon[0], recon[2], recon[1])
    return (np.asarray(y).tobytes() + np.asarray(v).tobytes()
            + np.asarray(u).tobytes())


def _parse_plane_streams(pairs, cfg: CodecConfig):
    """Per-plane (A, B) byte pairs -> stacked decoder input arrays."""
    L, capA, cap16 = _stream_caps(cfg)
    C = len(pairs)
    wA = np.zeros((C, capA), np.uint32)
    states = np.zeros((C, L), np.uint32)
    s16 = np.zeros((C, cap16), np.uint32)
    for c, (a, b) in enumerate(pairs):
        bufA = np.frombuffer(a + b"\x00" * ((-len(a)) % 4), "<u4")
        wA[c, : min(len(bufA), capA)] = bufA[:capA]
        b32 = np.frombuffer(
            b[: 4 * L] + b"\x00" * max(4 * L - len(b), 0), "<u4")
        states[c] = b32[:L]
        body = np.frombuffer(
            b[4 * L :] + b"\x00" * ((-(len(b) - 4 * L)) % 2), "<u2")
        s16[c, : len(body)] = body
    return jnp.asarray(wA), jnp.asarray(states), jnp.asarray(s16)


MAGIC = b"RTV1"
# v3 in lockstep with the image container: frames embed the same rANS
# plane streams, so the same table/wire-layout changes apply (ADVICE r3)
# v4: median-predictor MV coding (zero flag + residual size classes)
VERSION = 4


def encode_video(frames: np.ndarray, quant: int = 9,
                 gop: int = GOP_DEFAULT, n_refs: int = 1) -> bytes:
    """frames: (N, H, W) grayscale or (N, H, W, 3) RGB uint8; H, W
    multiples of 8. n_refs > 1 enables the multi-reference ring (each
    8x8 block picks its best of the last n_refs reconstructions).
    Returns an RTV1 container."""
    color = frames.ndim == 4
    n, h, w = frames.shape[:3]
    channels = 3 if color else 1
    # arbitrary dims: edge-replicate pad to the 8x8 MV-block grid (the
    # reference handles this with its BORDER=15 frame margin,
    # image.cpp:56-68); the header keeps the true dims, decode crops.
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w)) + (
            ((0, 0),) if color else ())
        frames = np.pad(frames, pad, mode="edge")
    key_enc, p_enc, _, _ = _frame_fns(wp, hp, quant, channels, n_refs)

    out = [struct.pack("<4sBBBHIIB", MAGIC, VERSION, 1 if color else 0,
                       quant, gop, w, h, n_refs)]
    out.append(struct.pack("<I", n))
    ring = None
    payload = []
    for t in range(n):
        x = _planes_from_frame(frames[t], channels)
        is_key = (t % gop) == 0 or ring is None
        if is_key:
            wAs, tAs, wBs, tBs, ring = key_enc(x)
            mv_stream = b""
            ftype = 0
        else:
            (wAs, tAs, wBs, tBs, ring,
             mvy, mvx, refidx, intra) = p_enc(x, ring)
            mv_stream = encode_mv(
                mvy, mvx, intra, refidx if n_refs > 1 else None)
            ftype = 1
        planes = []
        for c in range(channels):
            planes.append((
                image_codec.words_to_bytes(wAs[c], int(tAs[c])),
                image_codec.words_to_bytes(wBs[c], int(tBs[c])),
            ))
        payload.append((ftype, mv_stream, planes))
    for ftype, mv, planes in payload:
        lens = [len(mv)]
        for a, b in planes:
            lens += [len(a), len(b)]
        out.append(struct.pack(f"<B{len(lens)}I", ftype, *lens))
        streams = [mv] + [s for ab in planes for s in ab]
        for s in streams:
            out.append(s + b"\x00" * ((-len(s)) % 4))
    return b"".join(out)


def decode_video(data: bytes) -> np.ndarray:
    magic, version, color, quant, gop, w, h, n_refs = struct.unpack(
        "<4sBBBHIIB", data[:18])
    assert magic == MAGIC and version == VERSION
    (n,) = struct.unpack("<I", data[18:22])
    channels = 3 if color else 1
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    cfg = _frame_cfg(wp, hp, quant)
    _, _, key_dec, p_dec = _frame_fns(wp, hp, quant, channels, n_refs)
    gy, gx = hp // 8, wp // 8
    off = 22
    shape = (n, hp, wp, 3) if color else (n, hp, wp)
    frames = np.empty(shape, np.uint8)
    ring = None
    nlen = 1 + 2 * channels
    for t in range(n):
        ftype = data[off]
        lens = struct.unpack(f"<{nlen}I", data[off + 1 : off + 1 + 4 * nlen])
        off += 1 + 4 * nlen
        subs = []
        for ln in lens:
            subs.append(data[off : off + ln])
            off += ln + ((-ln) % 4)
        mv = subs[0]
        pairs = [(subs[1 + 2 * c], subs[2 + 2 * c]) for c in range(channels)]
        wAs, states, s16s = _parse_plane_streams(pairs, cfg)
        if ftype == 0:
            ring = key_dec(wAs, states, s16s)
        else:
            mvy, mvx, intra, refidx = decode_mv(mv, gy, gx, n_refs)
            ring = p_dec(wAs, states, s16s, mvy, mvx, refidx, intra, ring)
        frames[t] = _frame_to_pixels(ring[0], channels)
    return frames[:, :h, :w]
