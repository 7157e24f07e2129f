"""DCT coding profile: lapped binDCT intra codec over the shared 4x4
block entropy layer (the north star's "DCT/geometric intra" capability;
the reference orphans its dct2d.cpp — this wires ours end to end).

Pipeline (lossy only):
  pixels -> lapped_pre -> 8x8 binDCT (models/dct.py, dct2d.cpp:186-218)
  -> per-frequency TSUQ (tsuq_dct, dct2d.cpp:323-378) -> EZDCT regrouping
  -> the wavelet profile's zerotree + rANS entropy layer -> RTP1 container
  (flags bit 7).

EZDCT regrouping: each 8x8 DCT block is read as a 3-level dyadic
decomposition of itself — DC at (0,0), scale-2 details at freq 1, scale-1
at freqs [2,4), scale-0 at freqs [4,8) — and same-frequency-group coeffs
from all blocks assemble into wavelet-shaped global bands (DC band
(H/8, W/8) ... finest (H/2, W/2)). Block-local placement makes the
parent-of-(y,x) = (y//2, x//2) zerotree geometry hold exactly, so
make-plans/payload/scan machinery is reused unchanged with band quant 1
(the DCT path quantized already).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, C_Q_BOOST, SHIFT, quant_step
from ric_tpu.models import dct
from ric_tpu.models import image_codec as ic
from ric_tpu.models import tables as tbl
from ric_tpu.ops import bounds, rans
from ric_tpu.utils import container

# dyadic frequency groups per scale: (low range, high range)
_GROUPS = {2: ((0, 1), (1, 2)), 1: ((0, 2), (2, 4)), 0: ((0, 4), (4, 8))}


def _pad8(x):
    h, w = x.shape[-2:]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        x = jnp.pad(x, [(0, ph), (0, pw)], mode="edge")
    return x


def dct_to_pyramid(c):
    """(H, W) DCT plane (H, W % 8 == 0) -> wavelet-shaped pyramid
    [{V,H,D} level 0 (finest) .. level 2 + L]."""
    H, W = c.shape
    by, bx = H // 8, W // 8
    blk = c.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)  # (by, bx, 8, 8)

    def band(jr, ir):
        sub = blk[:, :, jr[0] : jr[1], ir[0] : ir[1]]
        sj, si = jr[1] - jr[0], ir[1] - ir[0]
        return sub.transpose(0, 2, 1, 3).reshape(by * sj, bx * si)

    pyr = []
    for lvl in range(3):
        lo, hi = _GROUPS[lvl]
        entry = {
            "H": band(lo, hi),   # low row freq, high col freq
            "V": band(hi, lo),
            "D": band(hi, hi),
        }
        if lvl == 2:
            entry["L"] = band(lo, lo)
        pyr.append(entry)
    return pyr


def pyramid_to_dct(coeffs, H: int, W: int):
    """Inverse regrouping: band dict {'L','V2',...,'D0'} -> (H, W) plane."""
    by, bx = H // 8, W // 8
    blk = jnp.zeros((by, bx, 8, 8), jnp.int32)

    def place(blk, arr, jr, ir):
        sj, si = jr[1] - jr[0], ir[1] - ir[0]
        sub = arr.reshape(by, sj, bx, si).transpose(0, 2, 1, 3)
        return blk.at[:, :, jr[0] : jr[1], ir[0] : ir[1]].set(sub)

    for lvl in range(3):
        lo, hi = _GROUPS[lvl]
        blk = place(blk, coeffs[f"H{lvl}"], lo, hi)
        blk = place(blk, coeffs[f"V{lvl}"], hi, lo)
        blk = place(blk, coeffs[f"D{lvl}"], hi, hi)
    blk = place(blk, coeffs["L"], _GROUPS[2][0], _GROUPS[2][0])
    return blk.transpose(0, 2, 1, 3).reshape(H, W)


def _dct_quant(cfg: CodecConfig, chroma: bool) -> int:
    """Base step for the per-frequency table: the wavelet ladder step at
    the same -q index (+chroma boost) — measured to track the wavelet
    profile's PSNR within ~1 dB at the same index."""
    q = cfg.quant + (C_Q_BOOST if chroma else 0)
    return quant_step(min(q, 31) + SHIFT * 5)


def make_dct_plans(cfg: CodecConfig, chroma: bool):
    """BandPlan list (stream order: L, then coarse->fine V,H,D) for the
    EZDCT pyramid; band quant 1 (tsuq_dct already quantized)."""
    H, W = -(-cfg.height // 8) * 8, -(-cfg.width // 8) * 8
    # quantized-coeff magnitude bound: 12-bit input, x16 2-D transform
    # gain, min per-frequency step 16 (dct_quant_table floor)
    cmax = ((1 << 12) * 64 * 16) // 16 // 16 + 2
    rd0 = tuple(int(v) for v in np.zeros(16, np.int32))
    plans = []
    ll_shape = (H // 8, W // 8)
    ll_res_bound = 4 * (2 * cmax + 1) + 2
    plans.append(ic.BandPlan(
        "L", "L", 2, "ll", ll_shape, ic._grid(ll_shape), 1, (),
        bounds.flen_bound(ll_res_bound, 1)))
    for lvl in range(2, -1, -1):
        n = 8 >> (lvl + 1)  # half-band sizes per scale: 1, 2, 4
        sh = {(2): (H // 8, W // 8), (1): (H // 4, W // 4),
              (0): (H // 2, W // 2)}[lvl]
        kind = "high" if lvl == 0 else "low"
        for orient in ("V", "H", "D"):
            plans.append(ic.BandPlan(
                f"{orient}{lvl}", orient, lvl, kind, sh, ic._grid(sh), 1,
                rd0, bounds.flen_bound(cmax, 1)))
    return plans, (H, W)


def _pcfg(cfg: CodecConfig, chroma: bool) -> CodecConfig:
    H, W = -(-cfg.height // 8) * 8, -(-cfg.width // 8) * 8
    return dataclasses.replace(cfg, width=W, height=H)


@functools.lru_cache(maxsize=16)
def _cached_dct_encoder(cfg: CodecConfig, chroma: bool):
    plans, (H, W) = make_dct_plans(cfg, chroma)
    pc = _pcfg(cfg, chroma)
    L = ic._lanes(pc)
    capA = ic._cap_words_a(pc)
    cap16 = ic._cap_words16(plans, L)
    image_tables = ic._use_image_tables(pc)
    tctx = tbl.get_table_ctx(tbl.rate_bucket(cfg.quant), chroma)
    quant = _dct_quant(cfg, chroma)
    packed = ic._packed_mode(pc)

    def enc(x):
        x = _pad8(x)
        c = dct.dct2d_blocks(dct.lapped_pre(x))
        q = dct.tsuq_dct(c, quant)
        payload = ic._payload_from_pyramid(plans, dct_to_pyramid(q))
        return ic._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            packed=packed)

    return jax.jit(enc), plans, L, capA, cap16


@functools.lru_cache(maxsize=16)
def _cached_dct_decoder(cfg: CodecConfig, chroma: bool):
    plans, (H, W) = make_dct_plans(cfg, chroma)
    pc = _pcfg(cfg, chroma)
    L = ic._lanes(pc)
    image_tables = ic._use_image_tables(pc)
    tctx = tbl.get_table_ctx(tbl.rate_bucket(cfg.quant), chroma)
    quant = _dct_quant(cfg, chroma)
    sparse = ic._sparse_decode(pc)

    def dec(wordsA, states, stream16):
        coeffs = ic._streams_to_coeffs(
            plans, L, 3, image_tables, tctx, wordsA, states, stream16,
            sparse=sparse, packed=ic._packed_mode(pc))
        qplane = pyramid_to_dct(coeffs, H, W)
        c = dct.tsuq_dct_inverse(qplane, quant)
        x = dct.lapped_post(dct.idct2d_blocks(c))
        return x[: cfg.height, : cfg.width]

    return jax.jit(dec), plans, L


def encode_plane_dct(x, cfg: CodecConfig, chroma: bool):
    enc, plans, L, capA, cap16 = _cached_dct_encoder(cfg, chroma)
    wA, tA, wB, tB = enc(jnp.asarray(x, jnp.int32))
    return (ic.words_to_bytes(wA, int(tA)), ic.words_to_bytes(wB, int(tB)))


def decode_plane_dct(streamA: bytes, streamB: bytes, cfg: CodecConfig,
                     chroma: bool) -> np.ndarray:
    dec, plans, L = _cached_dct_decoder(cfg, chroma)
    pc = _pcfg(cfg, chroma)
    capA = ic._cap_words_a(pc)
    cap16 = ic._cap_words16(plans, L) + L + 8
    bufA = np.frombuffer(streamA + b"\x00" * ((-len(streamA)) % 4), "<u4")
    wA = np.zeros(capA, np.uint32)
    wA[: min(len(bufA), capA)] = bufA[:capA]
    b32 = np.frombuffer(
        streamB[: 4 * L] + b"\x00" * max(4 * L - len(streamB), 0), "<u4")
    states = b32[:L].astype(np.uint32)
    w16 = np.frombuffer(
        streamB[4 * L :] + b"\x00" * ((-(len(streamB) - 4 * L)) % 2), "<u2")
    s16 = np.zeros(cap16, np.uint32)
    s16[: min(len(w16), cap16)] = w16[:cap16]
    out = dec(jnp.asarray(wA), jnp.asarray(states), jnp.asarray(s16))
    return np.asarray(out)


def encode_image_dct(img: np.ndarray, cfg: CodecConfig) -> bytes:
    """Lossy DCT-profile container (flags bit 7). quant >= 1 required."""
    assert cfg.quant >= 1, "DCT profile is lossy (quant >= 1)"
    # both sides of this profile run fixed 8-bit offsets ((x-128)<<SHIFT /
    # 128+(x>>SHIFT)); a 16-bit container would record input_depth=16 and
    # silently decode garbage (ADVICE r3)
    assert cfg.input_depth == 8, "DCT profile supports 8-bit input only"
    img = jnp.asarray(img).astype(jnp.int32)
    streams = []
    if cfg.channels == 3:
        y, co, cg = ic.rgb_to_ycocg(img, SHIFT)
        streams += list(encode_plane_dct(y, cfg, False))
        streams += list(encode_plane_dct(cg, cfg, True))
        streams += list(encode_plane_dct(co, cfg, True))
    else:
        x = (img - 128) << SHIFT
        streams += list(encode_plane_dct(x, cfg, False))
    return container.write_container(cfg, streams, dct=True)


def decode_image_dct(cfg: CodecConfig, streams: list[bytes]) -> np.ndarray:
    if cfg.channels == 3:
        y = decode_plane_dct(streams[0], streams[1], cfg, False)
        cgp = decode_plane_dct(streams[2], streams[3], cfg, True)
        cop = decode_plane_dct(streams[4], streams[5], cfg, True)
        rgb = ic.ycocg_to_rgb(
            jnp.asarray(y), jnp.asarray(cop), jnp.asarray(cgp), SHIFT)
        return np.asarray(rgb).astype(np.int32)
    x = decode_plane_dct(streams[0], streams[1], cfg, False)
    x = 128 + ((x + (1 << (SHIFT - 1))) >> SHIFT)
    return np.clip(x, 0, 255).astype(np.int32)
