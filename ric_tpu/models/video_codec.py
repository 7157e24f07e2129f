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

MV fields are 2-D-gradient delta coded (like the LL band) and raw
bit-packed: per node an intra flag, then per component a 4-bit size class
and size-1 refinement bits — tiny substream, fully parallel both ways.

Container RTV1: per-frame (ftype, mv, residual A/B) substreams.
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
# 1/2 = size classes of the y/x gradient residuals (skewed to 0).
_MV_SEED = np.zeros((3, 32), np.int32)
_MV_SEED[0, :2] = (230, 26)
for _t in (1, 2):
    _MV_SEED[_t, :16] = np.maximum((256 * 0.5 ** np.arange(16)).astype(int), 1)


def _mv_symbols(mvy, mvx, intra):
    """(symbols, tids, refinement vals, refinement lens) for one MV field."""
    syms = [intra.astype(jnp.int32).ravel()]
    tids = [jnp.zeros(intra.size, jnp.int32)]
    rvals, rlens = [], []
    for t, comp in ((1, mvy), (2, mvx)):
        c = jnp.where(intra, 0, comp)
        u = s2u_(image_codec._grad2d(c))
        s = bitlen(u)
        refv = u - jnp.where(s > 0, jnp.int32(1) << jnp.maximum(s - 1, 0), 0)
        syms.append(s.ravel())
        tids.append(jnp.full(s.size, t, jnp.int32))
        rvals.append(refv.ravel())
        rlens.append(jnp.where(s > 0, s - 1, 0).ravel())
    return syms, tids, rvals, rlens


def encode_mv(mvy, mvx, intra) -> bytes:
    """Adaptive serial range coding of (flags, size classes) via the native
    C++ backend, refinement bits raw-packed; the two parts concatenate with
    a u16 length prefix."""
    from ric_tpu.utils import native

    n = intra.size
    syms, tids, rvals, rlens = _mv_symbols(mvy, mvx, intra)
    enc = native.SerialEncoder(_MV_SEED)
    enc.put(
        np.concatenate([np.asarray(s) for s in syms]),
        np.concatenate([np.asarray(t) for t in tids]),
        np.ones(3 * n, np.uint8),
    )
    rc = enc.finish()
    words, total = bitpack.pack(
        jnp.concatenate(rvals), jnp.concatenate(rlens), (n * 30) // 32 + 4
    )
    raw = image_codec.words_to_bytes(words, int(total))
    return struct.pack("<I", len(rc)) + rc + raw


def decode_mv(data: bytes, gy: int, gx: int):
    from ric_tpu.utils import native

    n = gy * gx
    (lrc,) = struct.unpack("<I", data[:4])
    rc = data[4 : 4 + lrc]
    raw = data[4 + lrc :]
    dec = native.SerialDecoder(_MV_SEED, rc)
    intra = dec.get(np.zeros(n, np.int32), np.ones(n, np.uint8))
    sy = dec.get(np.full(n, 1, np.int32), np.ones(n, np.uint8))
    sx = dec.get(np.full(n, 2, np.int32), np.ones(n, np.uint8))
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
        comps.append(image_codec._cumsum2d(u2s_(u).reshape(gy, gx)))
    mvy, mvx = comps
    return mvy, mvx, jnp.asarray(intra.reshape(gy, gx) == 1)


# --------------------------------------------------------------------------
# Frame pipeline
# --------------------------------------------------------------------------


def _encode_frame_plane(x, cfg: CodecConfig):
    a, b = image_codec.encode_plane_bytes(x, cfg, chroma=False)
    return a, b


def _decode_frame_plane(a: bytes, b: bytes, cfg: CodecConfig):
    return image_codec.decode_plane_bytes(a, b, cfg, chroma=False)


MAGIC = b"RTV1"


def encode_video(frames: np.ndarray, quant: int = 9,
                 gop: int = GOP_DEFAULT) -> bytes:
    """frames: (N, H, W) uint8 grayscale; H, W multiples of 8."""
    n, h, w = frames.shape
    assert h % 8 == 0 and w % 8 == 0, "video dims must be multiples of 8"
    cfg = _frame_cfg(w, h, quant)
    gy, gx = h // 8, w // 8

    out = [struct.pack("<4sBBHII", MAGIC, 1, quant, gop, w, h)]
    out.append(struct.pack("<I", n))
    recon = None
    payload = []
    for t in range(n):
        x = (jnp.asarray(frames[t], jnp.int32) - 128) << 4
        is_key = (t % gop) == 0 or recon is None
        if is_key:
            a, b = _encode_frame_plane(x, cfg)
            recon = jnp.asarray(_decode_frame_plane(a, b, cfg))
            payload.append((0, b"", a, b))
        else:
            bank = video.subpel_bank(recon)
            mvy, mvx, intra = video.motion_search(x, recon, bank)
            pred = video.obmc_predict(bank, mvy, mvx, intra, h, w)
            mv_stream = encode_mv(mvy, mvx, intra)
            res = x - pred
            a, b = _encode_frame_plane(res, cfg)
            res_rec = jnp.asarray(_decode_frame_plane(a, b, cfg))
            recon = pred + res_rec
            payload.append((1, mv_stream, a, b))
    for ftype, mv, a, b in payload:
        out.append(struct.pack("<BIII", ftype, len(mv), len(a), len(b)))
        for s in (mv, a, b):
            out.append(s + b"\x00" * ((-len(s)) % 4))
    return b"".join(out)


def decode_video(data: bytes) -> np.ndarray:
    magic, version, quant, gop, w, h = struct.unpack("<4sBBHII", data[:16])
    assert magic == MAGIC
    (n,) = struct.unpack("<I", data[16:20])
    cfg = _frame_cfg(w, h, quant)
    gy, gx = h // 8, w // 8
    off = 20
    frames = np.empty((n, h, w), np.uint8)
    recon = None
    for t in range(n):
        ftype, lmv, la, lb = struct.unpack("<BIII", data[off : off + 13])
        off += 13
        mv = data[off : off + lmv]
        off += lmv + ((-lmv) % 4)
        a = data[off : off + la]
        off += la + ((-la) % 4)
        b = data[off : off + lb]
        off += lb + ((-lb) % 4)
        if ftype == 0:
            recon = jnp.asarray(_decode_frame_plane(a, b, cfg))
        else:
            bank = video.subpel_bank(recon)
            mvy, mvx, intra = decode_mv(mv, gy, gx)
            pred = video.obmc_predict(bank, mvy, mvx, intra, h, w)
            res = jnp.asarray(_decode_frame_plane(a, b, cfg))
            recon = pred + res
        out = jnp.clip(128 + ((recon + 8) >> 4), 0, 255)
        frames[t] = np.asarray(out).astype(np.uint8)
    return frames
