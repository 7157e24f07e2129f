"""Still-image codec orchestration: the TPU-native equivalent of
reference CompressImage/DecompressImage + CWavelet2D::CodeBand/DecodeBand
(ric.cpp:123-251, wavelet2d.cpp:83-222, bandcodec.cpp).

Encode pipeline (one fused jit per plane):
  DWT (ops/lifting) -> per-band TSUQ + R/D kill (ops/blocks) -> zerotree
  subtree counts -> per-band entropy phases -> ONE interleaved-lane rANS
  stream (ops/rans v2) carrying both model-coded symbols and raw bit
  fields (as arithmetic uniform-table slots) in global raster word order.

Decode mirrors it as a sequence of per-band scans over the same stream;
every step is dense vector math + one contiguous window slice — there are
NO per-element gathers anywhere on the decode path (XLA TPU gathers
serialize; see ops/rans.py v2 header).

Per plane the container carries TWO substreams:
  A: the per-image rANS table section (12-bit fields), empty when the
     static bucket tables are used
  B: [L x u32 lane states][16-bit renorm words, raster order]

Band order (coarse -> fine so zerotree parents decode first):
  [LL residual] then per level (coarsest..finest): V, H, D.
Per band, slots are consumed in fused multi-phase steps:
  ZK scan   (1 slot/block):  z zerotree bit (ctx = parent 2x2 max bitlen)
                             then k count (same ctx; finest bands code k-1)
  PAT scan  (1 slot/block):  C(16,k) pattern rank, phase-in split into a
                             <=12-bit top field + derived low/extra bits
  SREF scan (1 slot/coeff):  s size class (model, ctx = min(k-1,15)) then
                             the refinement+sign raw field in the same
                             step; bands whose static interval bound
                             (ops/bounds) exceeds 12 bits get an extra
                             overflow phase.

The LL band is delta-coded with the separable 2-D gradient
r = x - left - up + upleft (the reference's interior DPCM predictor,
bandcodec.cpp:90-101) whose inverse is a 2-D cumulative sum.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, BLK_SIZE, SHIFT
from ric_tpu.ops import bitpack, blocks, bounds, enumcode, lifting, rans
from ric_tpu.ops import quant as qops
from ric_tpu.models import tables as tbl
from ric_tpu.utils.bits import bitlen, s2u_, u2s_
from ric_tpu.utils import container

_POW2_15 = 1 << (15 - np.arange(16))

# phase-in splits with hi wider than 12 bits need an even threshold so the
# long-code flag stays derivable from the top bits alone
assert all(
    int(enumcode.CNK_TH[k]) % 2 == 0
    for k in range(17) if int(enumcode.CNK_L[k]) > 12
)


@dataclasses.dataclass(frozen=True)
class BandPlan:
    name: str            # 'L', 'V3', 'H3', 'D3', ... (suffix = level)
    orient: str          # 'L' | 'V' | 'H' | 'D'
    level: int           # 0 = finest
    kind: str            # 'll' | 'low' | 'high'
    shape: tuple         # true (h, w)
    grid: tuple          # block grid of the padded band
    q: int               # band quant step
    rd: tuple            # R/D kill thresholds (16 ints)
    wmax: int = 15       # static bound on the refinement field length
    sfine: bool = False  # full-parML S context (planes < 4 Mpix)


def band_shapes(lh: int, lw: int):
    ch, fh = (lh + 1) // 2, lh // 2
    cw, fw = (lw + 1) // 2, lw // 2
    return {"D": (ch, cw), "H": (ch, fw), "V": (fh, cw), "L": (fh, fw)}


def _grid(shape):
    return ((shape[0] + 3) // 4, (shape[1] + 3) // 4)


def _input_bound(cfg: CodecConfig) -> int:
    if cfg.q_step >= 0:
        return 1 << 13  # video path: 12-bit-domain residuals
    if cfg.lossless or cfg.input_depth != 8:
        return 1 << (cfg.input_depth - 1)
    return (1 << 7) << SHIFT


def make_plane_plans(cfg: CodecConfig, chroma: bool):
    """Band plans in stream order + the level dims list."""
    dims = lifting.level_dims(cfg.width, cfg.height, cfg.levels)
    nlev = len(dims)
    weights = qops.band_weights(cfg.transform, nlev)
    quant = cfg.chroma_quant() if chroma else cfg.luma_quant()
    lam = cfg.chroma_lambda() if chroma else cfg.luma_lambda()
    abs_b = bounds.band_abs_bounds(
        Transform(cfg.transform), nlev, _input_bound(cfg))

    plans = []
    # small planes afford the 256-row S fetch; the same predicate on both
    # sides makes the context spec part of the format
    sfine = cfg.width * cfg.height < (1 << 22)
    ll_shape = band_shapes(*dims[-1])["L"]
    wq = qops.band_quant(quant, weights[nlev - 1]["L"])
    # LL residual: 2-D gradient of TSUQ'd lowpass, quantized with step 1
    ll_res_bound = 4 * (abs_b[nlev - 1]["L"] // max(wq, 1) + 1) + 2
    plans.append(
        BandPlan("L", "L", nlev - 1, "ll", ll_shape, _grid(ll_shape), wq, (),
                 bounds.flen_bound(ll_res_bound, 1), sfine)
    )
    for lvl in range(nlev - 1, -1, -1):
        shapes = band_shapes(*dims[lvl])
        for orient in ("V", "H", "D"):
            q = qops.band_quant(quant, weights[lvl][orient])
            lb = qops.band_lambda(lam, weights[lvl][orient])
            rd = tuple(int(v) for v in qops.rd_thresholds(q, lb))
            kind = "high" if lvl == 0 else "low"
            plans.append(
                BandPlan(
                    f"{orient}{lvl}", orient, lvl, kind,
                    shapes[orient], _grid(shapes[orient]), q, rd,
                    bounds.flen_bound(abs_b[lvl][orient], q), sfine,
                )
            )
    return plans, dims


# expected bpp per rate bucket, used only to budget the lane-state flush
_BPP_EST = {0: 4.5, 1: 2.5, 2: 1.5, 3: 0.4}


def _lanes(cfg: CodecConfig) -> int:
    """Lane count trades per-step fixed cost (wants many lanes) against
    the 4-byte/lane state flush (wants few). Budget: flush <= ~1.5% of the
    expected stream (npix * bucket-estimated bpp), so small or coarsely
    quantized images get narrower grids. Pure function of cfg — encoder
    and decoder derive the same value, nothing extra in the container."""
    if cfg.lanes_log2 >= 0:
        return 1 << cfg.lanes_log2
    npix = cfg.width * cfg.height
    bucket = 3 if cfg.q_step >= 256 else tbl.rate_bucket(cfg.quant)
    bpp_est = _BPP_EST[bucket]
    if bucket == 3 and cfg.q_step < 0 and npix < (1 << 22):
        # within bucket 3 the real rate keeps falling geometrically with
        # quant (~2x per 3 steps: corpus q21 streams run 0.005-0.05 bpp
        # against the bucket's 0.4 estimate), and on small planes the
        # 4 B/lane flush priced off that estimate was 10-25% of the whole
        # stream (rate_audit: darkwood q21 took 8 lanes = 32 B on a 235 B
        # stream). Track the decay so deep-quant small planes drop to the
        # 2-lane floor. Large planes keep the flat estimate: their lane
        # count trades against scan trip count, not rate.
        bpp_est *= 2.0 ** (-(cfg.quant - 14) / 3.0)
    est_bytes = npix * bpp_est / 8
    # large images take the wider grid (scan-step count dominates their
    # runtime); small images take the tighter rate budget. Round-4 audit
    # (tools/rate_audit.py): at 512^2 the flush was 50-100% of the whole
    # rate gap vs the reference (q21: 128 B on streams as small as 340 B),
    # so the small-image budget tightened to 0.0035 and the still floor
    # dropped to 2 lanes (the packed sparse scans keep trip counts
    # tolerable at narrow grids).
    frac = 0.015 if npix >= (1 << 22) else 0.0035
    cap = int(est_bytes * frac / 4)
    # floor: 32 lanes for the video path (per-frame latency matters, but
    # the packed sparse scans keep trip counts tiny at video residual
    # sparsity — the flush was ~2% of a 720p P-frame at 64), 2 for
    # stills — at bucket-3 rates a 512^2 stream can be a few hundred
    # bytes and the 4 B/lane flush is the dominant fixed cost; the packed
    # scans keep ceil(active/L) trip counts tolerable at these sizes
    floor = 5 if cfg.q_step >= 0 else 1
    l = 1 << max(floor, cap.bit_length() - 1)
    return min(32768, l)


def _use_image_tables(cfg: CodecConfig) -> bool:
    """Static CANDIDACY for the per-image two-pass table section. When
    true, the encoder computes the coarse histogram and decides IN-GRAPH
    whether the section pays (measured coarse KL gain vs the delta-coded
    section's actual bit cost — smooth/sparse images at 512^2 were paying
    a 4-10% section for less gain, r3 corpus sweep); when it does not,
    stream A is empty and the decoder's unconditional modulated path
    collapses exactly to the static fine tables (zero deltas ->
    modulate(fine, stat, stat) == fine, integer-exact).

    Candidates: big enough planes at buckets 0..2, plus mid-size planes at
    bucket 3 (huge bucket-3 planes skip the histogram pass — it would cost
    encode throughput where rate is already tiny).

    (Measured alternative: per-band table EVOLUTION — both sides deriving
    tables from already-decoded symbols, no table section at all — was
    tried and codes hopper q0 at 4.668 bpp shared / 4.772 per-orient-chain
    vs 4.631 for transmitted per-image tables: band statistics shift
    too much across levels for cross-band adaptation to pay. The reference
    adapts WITHIN bands serially, which a parallel decoder cannot.)"""
    npix = cfg.width * cfg.height
    if npix < (1 << 18):
        return False
    if tbl.rate_bucket(cfg.quant) <= 2:
        return True
    return npix < (1 << 22)


# static row-major list of valid (table, symbol) positions for serialization
_VALID_POS = np.argwhere(tbl._VALID)
_N_VALID = len(_VALID_POS)
# table section: per-image COARSE tables delta-coded against the static
# coarse projection (both sides know it). Layout: a 64-bit row-presence
# bitmap (each coarse table row is transmitted ONLY when its per-row KL
# gain beats its own bit cost — the encoder decides in-graph, the decoder
# reads the bitmap; absent rows mean zero deltas = the static row), then
# per transmitted entry a 4-bit bitlen prefix of zigzag(delta), then
# bitlen-1 body bits with the leading 1 implicit. Worst case 64 + 16/entry.
_TABLE_SECTION_BITS = 64 + _N_VALID * 17


def _table_deltas(freq, stat):
    rows = jnp.asarray(_VALID_POS[:, 0])
    cols = jnp.asarray(_VALID_POS[:, 1])
    d = freq[rows, cols] - stat[rows, cols]
    zz = (d << 1) ^ (d >> 31)
    blen = bitlen(zz)
    return rows, zz, blen


def _pack_table_section(freq, stat, keep, capA):
    """freq/stat (N_TABLES, ALPHABET) int32, keep (N_TABLES,) bool ->
    (wordsA, totalA). Entries of dropped rows are skipped entirely."""
    rows, zz, blen = _table_deltas(freq, stat)
    ek = keep[rows]
    body = zz - jnp.where(
        blen > 0, jnp.int32(1) << jnp.maximum(blen - 1, 0), 0)
    kb = keep.astype(jnp.uint32)
    bits = jnp.arange(64, dtype=jnp.uint32) % 32
    bm = kb << bits
    bm_lo = jnp.sum(jnp.where(jnp.arange(64) < 32, bm, 0)).astype(jnp.int32)
    bm_hi = jnp.sum(jnp.where(jnp.arange(64) >= 32, bm, 0)).astype(jnp.int32)
    vals = jnp.concatenate(
        [jnp.stack([bm_lo, bm_hi]), blen, body])
    lens = jnp.concatenate([
        jnp.full((2,), 32, jnp.int32),
        jnp.where(ek, 4, 0),
        jnp.where(ek, jnp.maximum(blen - 1, 0), 0),
    ])
    return bitpack.pack(vals, lens, capA)


def _unpack_table_section(wordsA, stat):
    """wordsA -> freq (N_TABLES, ALPHABET) int32 (three fixed passes: the
    64-bit row bitmap, the 4-bit prefixes at bitmap-rank offsets, then the
    bodies at their prefix-sum offsets — no serial walk). An all-zero
    buffer (no section sent) yields freq == stat exactly."""
    n = _N_VALID
    bm2 = bitpack.unpack(
        wordsA, jnp.asarray([0, 32], jnp.int32),
        jnp.full((2,), 32, jnp.int32)).astype(jnp.uint32)
    ridx = jnp.arange(tbl.N_TABLES, dtype=jnp.int32)
    keep = jnp.where(
        ridx < 32, (bm2[0] >> (ridx % 32)) & 1, (bm2[1] >> (ridx % 32)) & 1
    ).astype(bool)
    rows = jnp.asarray(_VALID_POS[:, 0])
    cols = jnp.asarray(_VALID_POS[:, 1])
    ek = keep[rows]
    plens = jnp.where(ek, 4, 0)
    poffs, ptot = bitpack.excl_cumsum(plens)
    pref = jnp.where(ek, bitpack.unpack(
        wordsA, 64 + poffs, plens).astype(jnp.int32), 0)
    blens = jnp.maximum(pref - 1, 0)
    offs, _ = bitpack.excl_cumsum(blens)
    body = bitpack.unpack(wordsA, 64 + ptot + offs, blens).astype(jnp.int32)
    zz = jnp.where(
        pref > 0, (jnp.int32(1) << jnp.maximum(pref - 1, 0)) | body, 0)
    d = (zz >> 1) ^ -(zz & 1)
    freq = jnp.zeros((tbl.N_TABLES, tbl.ALPHABET), jnp.int32)
    return freq.at[rows, cols].set(stat[rows, cols] + d)


def _ref_phases(p: BandPlan) -> int:
    return 1 + (1 if p.wmax > 12 else 0) + (1 if p.wmax > 24 else 0)


def _plan_rows(plans, L: int) -> int:
    """Total packed-grid rows (= scan steps across all bands/phases)."""
    rows = 0
    for p in plans:
        n = p.grid[0] * p.grid[1]
        n2 = p.grid[0] * ((p.grid[1] + 1) // 2)  # checkerboard half
        t_blk = -(-n // L)
        t_half = -(-n2 // L)
        rows += 4 * t_half           # ZK passes A and B
        rows += 2 * t_blk            # PAT
        rows += (1 + _ref_phases(p)) * (-(-(n * 16) // L))   # SREF
    return rows


def _recon_offsets(cfg: CodecConfig) -> bool:
    """Centroid dequantization (v4 format): the encoder fits one 4-bit
    reconstruction bias per high band (applied as mag*q - d at mag==1 and
    mag*q - 2d at mag>=2, d = nibble*q/64) and ships it at the head of
    stream A. The reference reconstructs at the bin center (band.h:94-107
    TSUQi); wavelet coefficients are Laplacian-ish, so the in-bin centroid
    sits below the center and the fitted bias buys +0.02..+0.04 dB at the
    SAME rate (tools/recon_probe.py). Gated to mid/high-rate stills big
    enough that the 8 B side info is noise; sparse bucket-3 streams gain
    less than 8 B costs them."""
    return (not cfg.lossless and cfg.q_step < 0
            and tbl.rate_bucket(cfg.quant) <= 2
            and cfg.width * cfg.height >= (1 << 17)
            and cfg.levels <= 5)  # 3*levels+1 plans must fit 16 nibbles


def _cap_words_a(cfg) -> int:
    return _TABLE_SECTION_BITS // 32 + 2 + (2 if _recon_offsets(cfg) else 0)


def _cap_words16(plans, L: int) -> int:
    """Worst-case 16-bit word count of stream B's word section: one word
    per slot plus slack."""
    return _plan_rows(plans, L) * L + 64


class PlaneTooLarge(ValueError):
    """Single-tile plane exceeds the int32 bit-offset/total ceiling."""


def _check_plane_size(cfg: CodecConfig, plans, L: int):
    """Bit totals and word cursors are int32 (container dims are u32, so
    the format advertises sizes a single-tile stream can't carry —
    VERDICT round-1 weakness 5). Reject cleanly instead of overflowing:
    ~6k x 6k is the practical single-tile ceiling; larger images go
    through the tiled paths, whose per-tile streams stay small."""
    worst_bits = (_cap_words16(plans, L) + L + 8) * 16 + L * 32
    if worst_bits > (1 << 31) - 1:
        raise PlaneTooLarge(
            f"{cfg.width}x{cfg.height} plane: worst-case stream "
            f"({worst_bits} bits) exceeds the int32 ceiling; encode tiled "
            f"(parallel.tiling.encode_image_tiled_container or the "
            f"tiled-global mode) so per-tile substreams stay in range"
        )


def _grad2d(x):
    dy = jnp.concatenate([x[:1], x[1:] - x[:-1]], axis=0)
    return jnp.concatenate([dy[:, :1], dy[:, 1:] - dy[:, :-1]], axis=1)


def _cumsum2d(r):
    return jnp.cumsum(jnp.cumsum(r, axis=0), axis=1)


def _pattern_of(u_blk):
    bits = (u_blk != 0).astype(jnp.int32)
    return jnp.sum(bits * jnp.asarray(_POW2_15, jnp.int32), axis=-1)


def _coeff_size_fields(u_blk, k):
    """Per-coeff size class s = bitlen(mag-1), raw field ((ref<<1)|sign) of
    max(s,1) bits, and the coarse s-table context min(k-1,15)."""
    active = u_blk != 0
    mag1 = jnp.maximum((u_blk >> 1) - 1, 0)
    s = bitlen(mag1)
    refv = mag1 - jnp.where(s > 0, jnp.int32(1) << jnp.maximum(s - 1, 0), 0)
    field = jnp.where(s > 0, (refv << 1) | (u_blk & 1), u_blk & 1)
    flen = jnp.where(active, jnp.maximum(s, 1), 0)
    ctx = jnp.clip(k - 1, 0, 15)
    return active, s, field, flen, ctx


def _pml4(pml):
    """4-class parent-maxLen for the S context (keeps the SREF scan's
    table fetch 64 rows wide)."""
    return ((pml > 0).astype(jnp.int32) + (pml > 2) + (pml > 5))


# ---- checkerboard ZK split (round 4) -------------------------------------
# Blocks with (by+bx) even decode first (pass A, parML context); odd blocks
# follow in pass B with context parML x quantized-neighbor-k — every
# neighbor of an odd block is even, so the k values are causally available
# to the parallel decoder. This is the parallel-decodable counterpart of
# the reference's serial k_mean running context (bandcodec.cpp:480-490).


def _cb_split(x, fill):
    """(gy, gx) -> (A, B), each (gy, ceil(gx/2)): A = (by+bx) even cells
    in raster order, B = odd cells. Strided slices + row-parity select —
    no gathers. Odd gx pads with `fill` (inactive slots)."""
    gy, gx = x.shape
    if gx % 2:
        x = jnp.concatenate([x, jnp.full((gy, 1), fill, x.dtype)], axis=1)
    ev, od = x[:, 0::2], x[:, 1::2]
    rpar = (jnp.arange(gy, dtype=jnp.int32) & 1)[:, None]
    return (jnp.where(rpar == 0, ev, od), jnp.where(rpar == 0, od, ev))


def _cb_merge(A, B, gx):
    """Inverse of _cb_split (drops the pad column)."""
    gy = A.shape[0]
    rpar = (jnp.arange(gy, dtype=jnp.int32) & 1)[:, None]
    ev = jnp.where(rpar == 0, A, B)
    od = jnp.where(rpar == 0, B, A)
    return jnp.stack([ev, od], axis=-1).reshape(gy, -1)[:, :gx]


def _nbq_of(k2d):
    """Quantized mean of the four in-bounds neighbor k values. Both sides
    feed the PASS-A-ONLY k grid (odd cells zero), so only the values this
    function reads at odd cells — their even neighbors — are defined."""
    gy, gx = k2d.shape
    z_row = jnp.zeros((1, gx), k2d.dtype)
    z_col = jnp.zeros((gy, 1), k2d.dtype)
    s = (
        jnp.concatenate([z_row, k2d[:-1]], 0)
        + jnp.concatenate([k2d[1:], z_row], 0)
        + jnp.concatenate([z_col, k2d[:, :-1]], 1)
        + jnp.concatenate([k2d[:, 1:], z_col], 1)
    )
    yy = jnp.arange(gy, dtype=jnp.int32)[:, None]
    xx = jnp.arange(gx, dtype=jnp.int32)[None, :]
    cnt = ((yy > 0).astype(jnp.int32) + (yy < gy - 1)
           + (xx > 0) + (xx < gx - 1))
    nbk = s // jnp.maximum(cnt, 1)
    q = jnp.zeros_like(nbk)
    for t in tbl.NBQ_THRESH:
        q = q + (nbk > t)
    return q


def _plan_bases_b(p: BandPlan):
    """Pass-B table base rows (96 = parML x NBQ per band class)."""
    oid = 0 if p.orient == "L" else {"V": 0, "H": 1, "D": 2}[p.orient]
    lvlc = 2 if p.kind == "ll" else min(p.level, 2)
    zbB = tbl.zb_fine_base(lvlc, oid)
    if p.kind == "high":
        kbB = tbl.khb_fine_base(oid)
    else:
        kbB = tbl.klb_fine_base(lvlc, oid)
    return zbB, kbB


def _plan_bases(p: BandPlan):
    """Static fine-table base rows for a band (level/orient/kind are static
    per band, so richer contexts cost nothing in the scan: the tid stays
    the dynamic 16-value parML / 256-value parML*16+(k-1))."""
    oid = 0 if p.orient == "L" else {"V": 0, "H": 1, "D": 2}[p.orient]
    lvlc = 2 if p.kind == "ll" else min(p.level, 2)
    zb = tbl.z_fine_base(lvlc, oid)
    if p.kind == "high":
        kb = tbl.kh_fine_base(oid)
    else:
        kb = tbl.kl_fine_base(lvlc, oid)
    sb = tbl.s16_fine_base(lvlc) if p.sfine else tbl.s_fine_base(lvlc)
    return zb, kb, sb


def _s_width(p: BandPlan) -> int:
    """S-table slice width: 256 rows (full parML) on small planes,
    64 (pml4) on large ones."""
    return 256 if p.sfine else 64


def _sctx_of(p: BandPlan, ctx, k2d):
    """Per-block S context row within the band's S slice."""
    pml = ctx if p.sfine else _pml4(ctx)
    return pml * 16 + jnp.clip(k2d - 1, 0, 15)


def _sel17(table_np, k):
    """Static 17-entry table lookup as a select chain (no gathers)."""
    out = jnp.zeros(k.shape, jnp.int32)
    for kk in range(17):
        v = int(table_np[kk])
        if v:
            out = jnp.where(k == kk, jnp.int32(v), out)
    return out


def _pat_split(rank, k):
    """Encoder-side phase-in split of the pattern rank into the two slot
    values/widths (decoder derives plong/widths identically)."""
    pl = _sel17(enumcode.CNK_L, k)
    th = _sel17(enumcode.CNK_TH, k)
    plong = (rank >= th).astype(jnp.int32)
    hi = jnp.where(plong == 1, (rank + th) >> 1, rank)
    ex = jnp.where(plong == 1, (rank + th) & 1, 0)
    r = jnp.maximum(pl - 12, 0)          # hi bits that spill to phase B
    wa = pl - r                          # phase A width (= min(pl, 12))
    va = hi >> r
    wb = r + plong
    vb = ((hi & ((jnp.int32(1) << r) - 1)) << plong) | ex
    return va, wa, vb, wb


def _pat_widths_b(va, k):
    """Decoder-side phase-B width from the phase-A value (valid because
    CNK_TH is even whenever pl > 12)."""
    pl = _sel17(enumcode.CNK_L, k)
    th = _sel17(enumcode.CNK_TH, k)
    r = jnp.maximum(pl - 12, 0)
    plong = (va >= (th >> r)).astype(jnp.int32)
    return r, plong, th


def _pat_join(va, vb, r, plong, th):
    hi = (va << r) | ((vb >> plong) & ((jnp.int32(1) << r) - 1))
    ex = vb & plong
    long_code = hi >= th
    return jnp.where(long_code, ((hi << 1) | ex) - th, hi)


def _ref_split(field, flen, phases: int):
    """Split the refinement field into `phases` uniform slots of <=12 bits
    (top bits first)."""
    outs = []
    rem = flen
    for i in range(phases):
        below = jnp.maximum(rem - 12, 0)
        w = rem - below
        outs.append(((field >> below) & ((jnp.int32(1) << w) - 1), w))
        rem = below
    return outs


def _ref_join(parts):
    """parts: list of (value, width) from coarse to fine."""
    acc = jnp.zeros_like(parts[0][0])
    for v, w in parts:
        acc = (acc << w) | v
    return acc


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _payload_from_pyramid(plans, pyr, recon: bool = False):
    """Quantize + zerotree + per-band payload arrays (encoder forward
    half; also drives the table-fitting statistics pass). `recon` gates
    the centroid-dequant nibble fit (_recon_offsets): when the stream
    won't ship the nibbles (video, lossless, tiled, bucket-3) the float
    fit pass is skipped entirely instead of computed and discarded."""
    nlev = len(pyr)
    plan_by_name = {p.name: p for p in plans}

    u_bands, counts = {}, {}
    for lvl in range(nlev):
        for orient in ("V", "H", "D"):
            p = plan_by_name[f"{orient}{lvl}"]
            u, c = blocks.quantize_blocks(
                blocks.pad4(pyr[lvl][orient]), p.q,
                np.asarray(p.rd, np.int32),
            )
            u_bands[p.name] = u
            counts[p.name] = c
    pll = plan_by_name["L"]
    qll = qops.tsuq(pyr[nlev - 1]["L"], pll.q)
    u_bands["L"], counts["L"] = blocks.quantize_blocks(
        blocks.pad4(_grad2d(qll)), 1, np.zeros(16, np.int32)
    )

    sig, insig, alive = {}, {}, {}
    for orient in ("V", "H", "D"):
        chain = [counts[f"{orient}{l}"] for l in range(nlev)]
        sub = blocks.subtree_counts(chain)
        for lvl in range(nlev - 1, -1, -1):
            name = f"{orient}{lvl}"
            if lvl == nlev - 1:
                a = jnp.ones(chain[lvl].shape, bool)
            else:
                a = blocks.upsample_sig(
                    sig[f"{orient}{lvl+1}"], chain[lvl].shape
                )
            sig[name] = a & (sub[lvl] > 0)
            insig[name] = a & (sub[lvl] == 0)
            alive[name] = a

    payload = []
    for p in plans:
        u_blk = u_bands[p.name]
        k = counts[p.name]
        if p.kind == "ll" or p.level == nlev - 1:
            ctx = jnp.full(p.grid, 15, jnp.int32)
        else:
            par = plan_by_name[f"{p.orient}{p.level+1}"]
            par_u2d = blocks.from_blocks(
                u_bands[par.name], par.grid[0] * 4, par.grid[1] * 4
            )
            ctx = blocks.parent_ctx(par_u2d, p.grid)
        if p.kind == "ll":
            a = jnp.ones(p.grid, bool)
            z = jnp.zeros(p.grid, jnp.int32)
            s_mask = a
            z_act = jnp.zeros(p.grid, bool)
        else:
            a = alive[p.name]
            z = insig[p.name].astype(jnp.int32)
            s_mask = sig[p.name]
            z_act = a
        pattern = _pattern_of(u_blk)
        rank = enumcode.pattern_rank(pattern, k)
        va, wa, vb, wb = _pat_split(rank, k)
        active, s, field, flen, sctx = _coeff_size_fields(u_blk, k)
        # pass-B neighbor context from the CODED k values only (k = 0 at
        # insignificant/dead blocks — exactly what the decoder has after
        # its pass-A scan)
        k_eff = jnp.where(s_mask, k, 0)
        kA, _ = _cb_split(k_eff, 0)
        nbq = _nbq_of(_cb_merge(kA, jnp.zeros_like(kA), p.grid[1]))
        # centroid-dequant nibble (see _recon_offsets): LS fit of the
        # tied two-class bias d (mag==1) / 2d (mag>=2) against the true
        # pre-quantization coefficients, quantized to d = nib*q/64
        if not recon or p.kind == "ll" or p.q <= 1:
            dnib = jnp.int32(0)
        else:
            t_blk = blocks.to_blocks(
                blocks.pad4(pyr[p.level][p.orient])).astype(jnp.float32)
            xq = u2s_(jnp.where(s_mask[..., None], u_blk, 0))
            mag = jnp.abs(xq)
            over = (mag * p.q - jnp.sign(xq) * t_blk).astype(jnp.float32)
            m1 = mag == 1
            m2 = mag >= 2
            n1 = jnp.sum(m1.astype(jnp.float32))
            n2 = jnp.sum(m2.astype(jnp.float32))
            s12 = (jnp.sum(jnp.where(m1, over, 0.0))
                   + 2.0 * jnp.sum(jnp.where(m2, over, 0.0)))
            d = s12 / jnp.maximum(n1 + 4.0 * n2, 1.0)
            dnib = jnp.clip(
                jnp.round(d * (64.0 / p.q)), 0, 15).astype(jnp.int32)
        payload.append({
            "dnib": dnib,
            "plan": p, "u": u_blk, "k": k, "ctx": ctx, "alive": a,
            "z": z, "z_act": z_act, "sig": s_mask, "nbq": nbq,
            "pat_va": va, "pat_wa": wa, "pat_vb": vb, "pat_wb": wb,
            "active": active, "s": s, "field": field, "flen": flen,
            "sctx": sctx,
            "sctxf": (ctx if p.sfine else _pml4(ctx)) * 16 + sctx,
        })
    return payload


def _plane_payload(cfg: CodecConfig, plans, x):
    pyr = lifting.dwt(x, Transform(cfg.transform), cfg.levels)
    return _payload_from_pyramid(plans, pyr, recon=_recon_offsets(cfg))


def _hist_acc(hist, base, ctx, sym, act, nsym, nctx: int = 16):
    """Accumulate (ctx, sym) counts into hist rows [base, base+nctx)."""
    ctx = ctx.ravel()
    sym = jnp.clip(sym.ravel(), 0, nsym - 1)
    act = act.ravel()
    cn = jnp.arange(nctx, dtype=jnp.int32)
    an = jnp.arange(nsym, dtype=jnp.int32)
    # both operands are 0/1 (exact in bf16); accumulation stays f32 via
    # preferred_element_type, so DEFAULT precision is exact and runs at
    # full MXU rate (HIGHEST would multi-pass for nothing)
    ohc = (ctx[:, None] == cn[None, :]).astype(jnp.bfloat16)
    ohs = (sym[:, None] == an[None, :]).astype(jnp.bfloat16)
    ohs = ohs * act.astype(jnp.bfloat16)[:, None]
    h = jnp.dot(ohc.T, ohs, preferred_element_type=jnp.float32)
    pad = tbl.ALPHABET - nsym
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad)))
    return jax.lax.dynamic_update_slice(
        hist, jax.lax.dynamic_slice(hist, (base, 0), (nctx, tbl.ALPHABET))
        + h, (base, 0))


def _band_hist(pay):
    """One band's model-symbol histogram (the encoder-side twin of the
    decoder's in-loop count update — both sides must produce identical
    integers for the adaptive table evolution)."""
    p = pay["plan"]
    hist = jnp.zeros((tbl.N_TABLES, tbl.ALPHABET), jnp.float32)
    if p.kind != "ll":
        hist = _hist_acc(hist, tbl.Z_BASE, pay["ctx"], pay["z"],
                         pay["z_act"], 2)
    if p.kind == "high":
        hist = _hist_acc(hist, tbl.KH_BASE, pay["ctx"], pay["k"] - 1,
                         pay["sig"], 16)
    else:
        hist = _hist_acc(hist, tbl.KL_BASE, pay["ctx"], pay["k"],
                         pay["sig"], 17)
    sctx = pay["sctx"][..., None] * jnp.ones((1, 1, 16), jnp.int32)
    hist = _hist_acc(hist, tbl.S_BASE, sctx, pay["s"], pay["active"], 32)
    return hist.astype(jnp.int32)


def _hist_from_payload(payload, L_unused=None):
    """Whole-plane COARSE model-slot histograms (the per-image table
    section's space; also stats tools)."""
    hist = jnp.zeros((tbl.N_TABLES, tbl.ALPHABET), jnp.int32)
    for pay in payload:
        hist = hist + _band_hist(pay)
    return hist


def _band_hist_fine(pay):
    """One band's FINE-context histogram (tablegen corpus fitting) —
    accumulated per checkerboard pass, matching the coded (tid, sym)
    pairs of _band_rows exactly."""
    p = pay["plan"]
    zb, kb, sb = _plan_bases(p)
    zbB, kbB = _plan_bases_b(p)
    ksym = pay["k"] - (1 if p.kind == "high" else 0)
    nk = 16 if p.kind == "high" else 17
    ctxA, ctxB = _cb_split(pay["ctx"], 0)
    zA, zB = _cb_split(pay["z"], 0)
    zaA, zaB = _cb_split(pay["z_act"], False)
    sgA, sgB = _cb_split(pay["sig"], False)
    ksA, ksB = _cb_split(ksym, 0)
    _, nbqB = _cb_split(pay["nbq"], 0)
    tidB = ctxB * tbl.NBQ + nbqB
    hist = jnp.zeros((tbl.N_FINE, tbl.ALPHABET), jnp.float32)
    if p.kind != "ll":
        hist = _hist_acc(hist, zb, ctxA, zA, zaA, 2)
        hist = _hist_acc(hist, zbB, tidB, zB, zaB, 2, nctx=96)
    hist = _hist_acc(hist, kb, ctxA, ksA, sgA, nk)
    hist = _hist_acc(hist, kbB, tidB, ksB, sgB, nk, nctx=96)
    sctx = pay["sctxf"][..., None] * jnp.ones((1, 1, 16), jnp.int32)
    hist = _hist_acc(hist, sb, sctx, pay["s"], pay["active"], 32,
                     nctx=_s_width(p))
    return hist.astype(jnp.int32)


def build_plane_stats_fine(cfg: CodecConfig, chroma: bool):
    """Fine-context histogram pass: (N_FINE, ALPHABET) counts
    (tools/tablegen.py corpus fitting)."""
    plans, dims = make_plane_plans(cfg, chroma)

    def plane_stats(x):
        payload = _plane_payload(cfg, plans, x)
        hist = jnp.zeros((tbl.N_FINE, tbl.ALPHABET), jnp.int32)
        for pay in payload:
            hist = hist + _band_hist_fine(pay)
        return hist

    return jax.jit(plane_stats)


def _band_rows(pay, tables, L: int, packed: bool = False):
    """One band's packed (rows, L) grid in decoder consumption order.

    packed=False (dense mode, low quantizers): slots at their raveled
    positions, z/k and va/vb and s/refine rows interleaved so the decoder
    derives widths in-register inside fused scan steps.

    packed=True (sparse mode, quant >= 14): each sub-stream is a separate
    section whose ACTIVE slots are compacted to the front in rank order
    (rans.compact_by_mask). Every section's mask is known to the decoder
    before its scan runs (alive -> z, decoded z -> k, decoded k -> pattern
    widths, decoded patterns -> s, decoded s -> refinement widths), so
    both sides derive identical layouts; scan trip counts shrink to
    ceil(active/L) with 100% lane utilization — the R/D-killed worst-case
    grid is never walked (VERDICT r3 weak #1)."""
    def grid(a, fill=0):
        return rans.to_grid(a.ravel(), L, fill)

    def interleave(gs):
        T = gs[0].shape[0]
        return jnp.stack(gs, axis=1).reshape(T * len(gs), L)

    def cgrid(pk, mask):
        n = pk.shape[0]
        Tn = -(-n // L)
        dense, _ = rans.compact_by_mask(pk, mask, Tn * L)
        return dense.reshape(Tn, L)

    p = pay["plan"]
    zb, kb, sb = _plan_bases(p)
    zbB, kbB = _plan_bases_b(p)
    ctx = pay["ctx"]
    ksym = pay["k"] - (1 if p.kind == "high" else 0)
    rows = []
    # ZK: checkerboard pass A (parML ctx, 16-row slice) then pass B
    # (parML x nbq ctx from pass-A decoded neighbors, 96-row slice)
    ctxA, ctxB = _cb_split(ctx, 0)
    zA, zB = _cb_split(pay["z"], 0)
    zaA, zaB = _cb_split(pay["z_act"], False)
    sgA, sgB = _cb_split(pay["sig"], False)
    ksA, ksB = _cb_split(ksym, 0)
    _, nbqB = _cb_split(pay["nbq"], 0)
    tidB = ctxB * tbl.NBQ + nbqB
    pk_z = rans.enc_pack_model(
        rans.slice_tables(tables, zb, 16), zA.ravel(), ctxA.ravel(),
        zaA.ravel())
    pk_k = rans.enc_pack_model(
        rans.slice_tables(tables, kb, 16), ksA.ravel(), ctxA.ravel(),
        sgA.ravel())
    pk_zB = rans.enc_pack_model(
        rans.slice_tables(tables, zbB, 96), zB.ravel(), tidB.ravel(),
        zaB.ravel())
    pk_kB = rans.enc_pack_model(
        rans.slice_tables(tables, kbB, 96), ksB.ravel(), tidB.ravel(),
        sgB.ravel())
    if packed:
        rows.append(cgrid(pk_z, zaA.ravel()))
        rows.append(cgrid(pk_k, sgA.ravel()))
        rows.append(cgrid(pk_zB, zaB.ravel()))
        rows.append(cgrid(pk_kB, sgB.ravel()))
    else:
        rows.append(interleave([grid(pk_z), grid(pk_k)]))
        rows.append(interleave([grid(pk_zB), grid(pk_kB)]))
    # PAT
    sig = pay["sig"].ravel()
    wa = pay["pat_wa"].ravel()
    wb = pay["pat_wb"].ravel()
    pk_a = rans.enc_pack_uniform(pay["pat_va"].ravel(), wa, sig)
    pk_b = rans.enc_pack_uniform(pay["pat_vb"].ravel(), wb, sig)
    if packed:
        rows.append(cgrid(pk_a, sig & (wa > 0)))
        rows.append(cgrid(pk_b, sig & (wb > 0)))
    else:
        rows.append(interleave([grid(pk_a), grid(pk_b)]))
    # SREF
    act = pay["active"].ravel()
    sctx = (pay["sctxf"][..., None]
            * jnp.ones((1, 1, 16), jnp.int32)).ravel()
    pk_s = rans.enc_pack_model(
        rans.slice_tables(tables, sb, _s_width(p)), pay["s"].ravel(),
        sctx, act)
    parts = _ref_split(pay["field"].ravel(), pay["flen"].ravel(),
                       _ref_phases(p))
    pk_ref = [rans.enc_pack_uniform(v, w, act) for v, w in parts]
    if packed:
        rows.append(cgrid(pk_s, act))
        for (v, w), pk in zip(parts, pk_ref):
            rows.append(cgrid(pk, act & (w > 0)))
    else:
        rows.append(interleave([grid(pk_s)] + [grid(x) for x in pk_ref]))
    return jnp.concatenate(rows, axis=0)


def _encode_rows(plans, payload, tables, L: int, packed: bool = False):
    """Full packed (rows, L) grid in decoder consumption order."""
    return jnp.concatenate(
        [_band_rows(pay, tables, L, packed) for pay in payload], axis=0)


def _modulated_tables(tctx, q_img):
    """Per-image coarse tables -> modulated fine scan tables (both sides
    run this identical integer math; see rans.modulate_tables)."""
    freq_fine = rans.modulate_tables(
        jnp.asarray(tctx["fine"]), q_img, jnp.asarray(tctx["coarse"]),
        jnp.asarray(tbl.COARSE_OF), jnp.asarray(tbl._VALID_FINE))
    return rans.enc_dec_tables(freq_fine)


def _prefix_compact(cfg: CodecConfig) -> bool:
    """Encoder-only gate for the prefix word compaction (byte-identical
    stream, pure speed): pays exactly where the row-skip scan regime
    lives — big sparse stills whose worst-case grids dwarf the emitting
    prefix (compact_words alone was 47 of 129 ms at 4096^2 q20). Dense
    grids keep the dense 3-stage compaction (the dynamic chunk loop
    would walk the whole grid with loop overhead on top); the video
    path keeps it too (its fused frame graphs are compile-fragile)."""
    return (_sparse_decode(cfg) and not _packed_mode(cfg)
            and cfg.q_step < 0)


def _payload_to_streams(plans, L, capA, cap16, image_tables, tctx,
                        payload, constrain=None, packed=False,
                        recon=False, prefix=False):
    """Shared encoder tail: payload -> (wordsA, totalA, wordsB, totalB).
    Stream B = uint16 wire words: [2L state halves][16-bit renorm words].

    `constrain` (optional) applies a sharding constraint to the packed
    (T, L) grid so the rANS scan partitions over the lane axis — the
    tensor-style within-stage parallelism of parallel/lanes.py."""
    if recon:
        # 16 centroid-dequant nibbles (plans order) head stream A as two
        # u32 words; the table section follows at word offset 2
        capA = capA - 2
    if image_tables:
        hist = _hist_from_payload(payload)
        q_img = rans.device_normalize(hist, jnp.asarray(tbl._VALID))
        stat_c = jnp.asarray(tctx["coarse"])
        # per-ROW in-graph section decision: each coarse table row is
        # transmitted only when its measured KL gain beats its own bit
        # cost (+margin). Dropped rows fall back to the static row on
        # both sides (the decoder reads the row bitmap).
        h = hist.astype(jnp.float32)
        gain_row = jnp.sum(h * (
            jnp.log2(jnp.maximum(q_img, 1).astype(jnp.float32))
            - jnp.log2(jnp.maximum(stat_c, 1).astype(jnp.float32))),
            axis=1)
        rows_e, zz, blen = _table_deltas(q_img, stat_c)
        ecost = (4 + jnp.maximum(blen - 1, 0)).astype(jnp.float32)
        cost_row = jnp.zeros((tbl.N_TABLES,), jnp.float32).at[rows_e].add(
            ecost)
        keep = gain_row > cost_row + 16.0
        q_eff = jnp.where(keep[:, None], q_img, stat_c)
        mod_tables = _modulated_tables(tctx, q_eff)
        wordsA, totalA = _pack_table_section(q_img, stat_c, keep, capA)
        any_keep = jnp.any(keep)
        enc_tables = mod_tables
        wordsA = jnp.where(any_keep, wordsA, 0)
        totalA = jnp.where(any_keep, totalA, 0)
    else:
        enc_tables = tctx["dense"]
        wordsA = jnp.zeros((capA,), jnp.uint32)
        totalA = jnp.int32(0)
    if recon:
        nibw = jnp.zeros((2,), jnp.uint32)
        for i, pay in enumerate(payload):
            nibw = nibw.at[i // 8].add(
                pay["dnib"].astype(jnp.uint32) << (4 * (i % 8)))
        wordsA = jnp.concatenate([nibw, wordsA])
        totalA = totalA + 64
    rows = _encode_rows(plans, payload, enc_tables, L, packed)
    if constrain is not None:
        rows = constrain(rows)
    # partitioned-order emission grids: stable partition + silent inactive
    # rows make raster compaction order-equivalent, so the two full-grid
    # inverse permutations are skipped
    if prefix:
        states, emit, words, kact = rans.encode_packed_sparse(
            rows, reorder=False, return_nact=True)
        stream16, nw = rans.compact_words_prefix(emit, words, cap16, kact)
    else:
        states, emit, words = rans.encode_packed_sparse(rows, reorder=False)
        stream16, nw = rans.compact_words(emit, words, cap16)
    # wordsB is uint16: its row-major bytes ARE the wire layout, so no
    # element-order-preserving width change (a cross-lane de-interleave,
    # ~30 ms at 40M words on TPU) ever runs on device. The L states open
    # the stream as little-endian u32 = low u16 first.
    states16 = jax.lax.bitcast_convert_type(
        states, jnp.uint16).reshape(-1)
    wordsB = jnp.concatenate([states16, stream16])
    totalB = jnp.int32(L * 32) + nw * 16
    return wordsA, totalA, wordsB, totalB


def build_encode_plane(cfg: CodecConfig, chroma: bool):
    plans, dims = make_plane_plans(cfg, chroma)
    L = _lanes(cfg)
    _check_plane_size(cfg, plans, L)
    capA = _cap_words_a(cfg)
    cap16 = _cap_words16(plans, L)
    image_tables = _use_image_tables(cfg)
    packed = _packed_mode(cfg)
    tctx = tbl.get_table_ctx(_table_bucket(cfg), chroma)

    def encode_plane(x):
        payload = _plane_payload(cfg, plans, x)
        return _payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            packed=packed, recon=_recon_offsets(cfg),
            prefix=_prefix_compact(cfg))

    return jax.jit(encode_plane)


def build_plane_stats(cfg: CodecConfig, chroma: bool):
    """Histogram pass for table fitting: (N_TABLES, ALPHABET) model-symbol
    counts plus the raw (uniform-slot) bit count."""
    plans, dims = make_plane_plans(cfg, chroma)

    def plane_stats(x):
        payload = _plane_payload(cfg, plans, x)
        hist = _hist_from_payload(payload)
        rawbits = jnp.int32(0)
        pat_bits = jnp.int32(0)
        ref_bits = jnp.int32(0)
        for pay in payload:
            sig = pay["sig"].astype(jnp.int32)
            pb = jnp.sum(sig * (pay["pat_wa"] + pay["pat_wb"]))
            rb = jnp.sum(pay["flen"])
            pat_bits += pb
            ref_bits += rb
            rawbits += pb + rb
        diag = {"pattern_bits": pat_bits, "refine_bits": ref_bits}
        return hist, rawbits, diag

    return jax.jit(plane_stats)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def _from_grid2(g, grid):
    n = grid[0] * grid[1]
    return g.reshape(-1)[:n].reshape(grid)


def _decode_bands(plans, L, tables, states, stream, nlev,
                  reader=None, sparse=False, packed=False,
                  recon_nibs=None):
    """Decode all band coefficient arrays from the word stream.

    When `reader` is None this builds the jit scan graph over (states,
    stream); otherwise symbols come from the ArchivalReader (host serial
    coder) and the same per-band math runs eagerly with no stream.
    `sparse=True` routes the section scans through rans.scan_rows_sparse,
    which skips all-inactive slot rows with a dynamic trip count.
    `packed=True` (must match the encoder's mode — both gate on
    _sparse_decode(cfg)) additionally consumes the compacted sectioned
    layout of _band_rows(packed=True): per section, active slots sit
    densely at the front in rank order, so scans run ceil(active/L) steps
    at full lane utilization and outputs expand back to slot positions
    (rans.expand_by_mask). Returns {band name: dequantized coeffs}."""
    def _scan(body, carry, xs, row_act):
        if sparse:
            return rans.scan_rows_sparse(body, carry, xs, row_act)
        return jax.lax.scan(body, carry, xs)

    def packed_model_scan(x, gpos, tab, tid_flat, mask_flat):
        n_f = tid_flat.shape[0]
        Tn = -(-n_f // L)
        tidc, K = rans.compact_by_mask(
            tid_flat.astype(jnp.uint32), mask_flat, Tn * L)
        tid_g = tidc.astype(jnp.int32).reshape(Tn, L)
        act_g = jnp.arange(Tn * L, dtype=jnp.int32).reshape(Tn, L) < K

        def body(carry, inp):
            x, gpos = carry
            tid_r, act_r = inp
            sym, xn = rans.model_transition(tab, x, tid_r, act_r)
            x, gpos = rans.renorm(xn, act_r, stream, gpos)
            return (x, gpos), sym

        (x, gpos), sym_g = _scan(body, (x, gpos), (tid_g, act_g),
                                 jnp.any(act_g, axis=1))
        return x, gpos, rans.expand_by_mask(
            sym_g.reshape(-1), mask_flat, L)

    def packed_uniform_scan(x, gpos, w_flat, mask_flat):
        n_f = w_flat.shape[0]
        Tn = -(-n_f // L)
        wc, K = rans.compact_by_mask(
            w_flat.astype(jnp.uint32), mask_flat, Tn * L)
        w_g = wc.astype(jnp.int32).reshape(Tn, L)
        act_g = jnp.arange(Tn * L, dtype=jnp.int32).reshape(Tn, L) < K

        def body(carry, inp):
            x, gpos = carry
            w_r, act_r = inp
            v, xn = rans.uniform_transition(x, w_r, act_r)
            x, gpos = rans.renorm(xn, act_r & (w_r > 0), stream, gpos)
            return (x, gpos), v

        (x, gpos), v_g = _scan(body, (x, gpos), (w_g, act_g),
                               jnp.any(act_g, axis=1))
        return x, gpos, rans.expand_by_mask(v_g.reshape(-1), mask_flat, L)
    plan_by_name = {p.name: p for p in plans}
    coeffs, sig_maps, u2d_pad = {}, {}, {}
    x = states
    # anchor gpos to a data-dependent value so its sharding "varying" type
    # matches the scan carries under shard_map
    gpos = (
        (states[0] * jnp.uint32(0)).astype(jnp.int32)
        if states is not None else None
    )

    for pi, p in enumerate(plans):
        grid = p.grid
        n = grid[0] * grid[1]
        T_blk = -(-n // L)
        T_cf = -(-(n * 16) // L)
        if p.kind == "ll" or p.level == nlev - 1:
            ctx = jnp.full(grid, 15, jnp.int32)
        else:
            par = plan_by_name[f"{p.orient}{p.level+1}"]
            ctx = blocks.parent_ctx(u2d_pad[par.name], grid)
        if p.kind == "ll":
            a = jnp.ones(grid, bool)
        elif p.level == nlev - 1:
            a = jnp.ones(grid, bool)
        else:
            a = blocks.upsample_sig(sig_maps[f"{p.orient}{p.level+1}"], grid)

        is_ll = p.kind == "ll"
        is_high = p.kind == "high"
        zb, kb, sb = _plan_bases(p)
        zbB, kbB = _plan_bases_b(p)

        # checkerboard ZK: pass A over even-parity blocks (parML ctx),
        # pass B over odd blocks whose ctx adds the quantized mean of the
        # four pass-A-decoded neighbor k values (96-row slice)
        hs = (grid[0], (grid[1] + 1) // 2)
        ctxA, ctxB = _cb_split(ctx, 0)
        aliveA, aliveB = _cb_split(a, False)
        if reader is None:
            stab = rans.slice_tables(tables, sb, _s_width(p))

        def zk_scan(x, gpos, tid_g, alive_g, ztab, ktab):
            def zk_body(carry, inp):
                x, gpos = carry
                tid_r, alive_r = inp
                z_act = alive_r & (not is_ll)
                z, xn = rans.model_transition(ztab, x, tid_r, z_act)
                x, gpos = rans.renorm(xn, z_act, stream, gpos)
                sig_r = alive_r & (z == 0)
                kraw, xn = rans.model_transition(ktab, x, tid_r, sig_r)
                x, gpos = rans.renorm(xn, sig_r, stream, gpos)
                k = jnp.where(sig_r, kraw + (1 if is_high else 0), 0)
                return (x, gpos), (sig_r, k)

            return _scan(zk_body, (x, gpos), (tid_g, alive_g),
                         jnp.any(alive_g, axis=1))

        def zk_read(tid_g, alive_g, zbase, kbase):
            z = reader.read_model(alive_g.shape, zbase + tid_g,
                                  alive_g & (not is_ll))
            sig_g = alive_g & (z == 0)
            kraw = reader.read_model(sig_g.shape, kbase + tid_g, sig_g)
            return sig_g, jnp.where(
                sig_g, kraw + (1 if is_high else 0), 0)

        def half2d(g):
            return g.reshape(-1)[: hs[0] * hs[1]].reshape(hs)

        if packed and reader is None:
            zaA = aliveA & (not is_ll)
            x, gpos, zf = packed_model_scan(
                x, gpos, rans.slice_tables(tables, zb, 16),
                ctxA.ravel(), zaA.ravel())
            sigA = aliveA & (zf.reshape(hs) == 0)
            x, gpos, kraw = packed_model_scan(
                x, gpos, rans.slice_tables(tables, kb, 16),
                ctxA.ravel(), sigA.ravel())
            kA = jnp.where(
                sigA, kraw.reshape(hs) + (1 if is_high else 0), 0)
            nbq = _nbq_of(_cb_merge(kA, jnp.zeros_like(kA), grid[1]))
            _, nbqB = _cb_split(nbq, 0)
            tidB = ctxB * tbl.NBQ + nbqB
            zaB = aliveB & (not is_ll)
            x, gpos, zfB = packed_model_scan(
                x, gpos, rans.slice_tables(tables, zbB, 96),
                tidB.ravel(), zaB.ravel())
            sigB = aliveB & (zfB.reshape(hs) == 0)
            x, gpos, krB = packed_model_scan(
                x, gpos, rans.slice_tables(tables, kbB, 96),
                tidB.ravel(), sigB.ravel())
            kB = jnp.where(
                sigB, krB.reshape(hs) + (1 if is_high else 0), 0)
            sig = _cb_merge(sigA, sigB, grid[1])
            k2d = _cb_merge(kA, kB, grid[1])
        else:
            ctxA_g = rans.to_grid(ctxA.ravel(), L)
            aliveA_g = rans.to_grid(aliveA.ravel(), L, fill=False)
            if reader is None:
                (x, gpos), (sigA_g, kA_g) = zk_scan(
                    x, gpos, ctxA_g, aliveA_g,
                    rans.slice_tables(tables, zb, 16),
                    rans.slice_tables(tables, kb, 16))
            else:
                sigA_g, kA_g = zk_read(ctxA_g, aliveA_g, zb, kb)
            kA = half2d(kA_g)
            nbq = _nbq_of(_cb_merge(kA, jnp.zeros_like(kA), grid[1]))
            _, nbqB = _cb_split(nbq, 0)
            tidB = ctxB * tbl.NBQ + nbqB
            tidB_g = rans.to_grid(tidB.ravel(), L)
            aliveB_g = rans.to_grid(aliveB.ravel(), L, fill=False)
            if reader is None:
                (x, gpos), (sigB_g, kB_g) = zk_scan(
                    x, gpos, tidB_g, aliveB_g,
                    rans.slice_tables(tables, zbB, 96),
                    rans.slice_tables(tables, kbB, 96))
            else:
                sigB_g, kB_g = zk_read(tidB_g, aliveB_g, zbB, kbB)
            sig = _cb_merge(half2d(sigA_g), half2d(sigB_g), grid[1])
            k2d = _cb_merge(kA, half2d(kB_g), grid[1])
        sig_maps[p.name] = sig

        # PAT: widths derivable from k
        if packed and reader is None:
            pl2 = _sel17(enumcode.CNK_L, k2d)
            wa2 = jnp.where(sig, pl2 - jnp.maximum(pl2 - 12, 0), 0)
            x, gpos, va_f = packed_uniform_scan(
                x, gpos, wa2.ravel(), (sig & (wa2 > 0)).ravel())
            va2 = va_f.reshape(grid)
            r2, plong2, th2 = _pat_widths_b(va2, k2d)
            wb2 = jnp.where(sig, r2 + plong2, 0)
            x, gpos, vb_f = packed_uniform_scan(
                x, gpos, wb2.ravel(), (wb2 > 0).ravel())
            rank = jnp.where(
                sig, _pat_join(va2, vb_f.reshape(grid), r2, plong2, th2), 0)
        else:
            sig_g = rans.to_grid(sig.ravel(), L, fill=False)
            k_g = rans.to_grid(k2d.ravel(), L)
            pl_g = _sel17(enumcode.CNK_L, k_g)
            wa_g = jnp.where(sig_g, pl_g - jnp.maximum(pl_g - 12, 0), 0)

            if reader is None:
                def pat_body(carry, inp):
                    x, gpos = carry
                    k_r, sig_r, wa_r = inp
                    va, xn = rans.uniform_transition(x, wa_r, sig_r)
                    x, gpos = rans.renorm(
                        xn, sig_r & (wa_r > 0), stream, gpos)
                    r, plong, th = _pat_widths_b(va, k_r)
                    wb = jnp.where(sig_r, r + plong, 0)
                    vb, xn = rans.uniform_transition(x, wb, sig_r)
                    x, gpos = rans.renorm(
                        xn, sig_r & (wb > 0), stream, gpos)
                    rank = jnp.where(
                        sig_r, _pat_join(va, vb, r, plong, th), 0)
                    return (x, gpos), rank

                (x, gpos), rank_g = _scan(
                    pat_body, (x, gpos), (k_g, sig_g, wa_g),
                    jnp.any(sig_g, axis=1))
            else:
                va = reader.read_raw(wa_g.shape, wa_g, sig_g)
                r, plong, th = _pat_widths_b(va, k_g)
                wb = jnp.where(sig_g, r + plong, 0)
                vb = reader.read_raw(wb.shape, wb, sig_g)
                rank_g = jnp.where(
                    sig_g, _pat_join(va, vb, r, plong, th), 0)
            rank = _from_grid2(rank_g, grid)
        pattern = enumcode.pattern_unrank(rank, k2d)
        lane = jnp.arange(16, dtype=jnp.int32)
        active = sig[..., None] & (
            ((pattern[..., None] >> (15 - lane)) & 1) == 1
        )

        # SREF (fine ctx: parML*16 + min(k-1,15); parML is the same per-
        # block ctx the ZK scan used — decoded data, both sides agree)
        sctx = _sctx_of(p, ctx, k2d)
        sctx_cf = sctx[..., None] * jnp.ones((1, 1, 16), jnp.int32)
        phases = _ref_phases(p)
        ncf = n * 16

        if packed and reader is None:
            x, gpos, s_f = packed_model_scan(
                x, gpos, stab, sctx_cf.ravel(), active.ravel())
            s = s_f.reshape(grid + (16,))
            flen = jnp.where(active, jnp.maximum(s, 1), 0)
            rem = flen
            vals = []
            for _ in range(phases):
                below = jnp.maximum(rem - 12, 0)
                w = rem - below
                x, gpos, v_f = packed_uniform_scan(
                    x, gpos, w.ravel(), (w > 0).ravel())
                vals.append((v_f.reshape(grid + (16,)), w))
                rem = below
            field = _ref_join(vals)
        else:
            act_g = rans.to_grid(active.ravel(), L, fill=False)
            sctx_g = rans.to_grid(sctx_cf.ravel(), L)
            if reader is None:
                def sref_body(carry, inp, phases=phases, stab=stab):
                    x, gpos = carry
                    sctx_r, act_r = inp
                    s, xn = rans.model_transition(stab, x, sctx_r, act_r)
                    x, gpos = rans.renorm(xn, act_r, stream, gpos)
                    flen = jnp.where(act_r, jnp.maximum(s, 1), 0)
                    # widths top-first, matching _ref_split's order
                    rem = flen
                    widths = []
                    for _ in range(phases):
                        below = jnp.maximum(rem - 12, 0)
                        widths.append(rem - below)
                        rem = below
                    vals = []
                    for w in widths:
                        v, xn = rans.uniform_transition(x, w, act_r)
                        x, gpos = rans.renorm(
                            xn, act_r & (w > 0), stream, gpos)
                        vals.append((v, w))
                    field = _ref_join(vals)
                    return (x, gpos), (s, field)

                (x, gpos), (s_g, field_g) = _scan(
                    sref_body, (x, gpos), (sctx_g, act_g),
                    jnp.any(act_g, axis=1))
            else:
                s_g = reader.read_model(act_g.shape, sb + sctx_g, act_g)
                flen = jnp.where(act_g, jnp.maximum(s_g, 1), 0)
                vals = []
                rem = flen
                for _ in range(phases):
                    below = jnp.maximum(rem - 12, 0)
                    w = rem - below
                    v = reader.read_raw(w.shape, w, act_g)
                    vals.append((v, w))
                    rem = below
                field_g = _ref_join(vals)

            s = s_g.reshape(-1)[:ncf].reshape(grid + (16,))
            field = field_g.reshape(-1)[:ncf].reshape(grid + (16,))

        sign = field & 1
        mag1 = jnp.where(
            s > 0,
            (jnp.int32(1) << jnp.maximum(s - 1, 0)) | (field >> 1),
            0,
        )
        u = jnp.where(active, ((mag1 + 1) << 1) | sign, 0)
        u2d_pad[p.name] = blocks.from_blocks(u, grid[0] * 4, grid[1] * 4)
        xq = u2s_(u)
        if p.kind == "ll":
            res = blocks.from_blocks(xq, *p.shape)
            coeffs["L"] = qops.tsuq_inverse(_cumsum2d(res), p.q)
        else:
            if p.q > 1:
                if recon_nibs is not None:
                    # centroid dequant (see _recon_offsets): bias the
                    # reconstruction below the bin center by d / 2d for
                    # mag 1 / >=2, d = nib*q/64 fitted by the encoder
                    d1 = (recon_nibs[pi] * p.q) >> 6
                    mag = jnp.abs(xq)
                    xq = jnp.sign(xq) * jnp.maximum(
                        mag * p.q - jnp.where(mag == 1, d1, 2 * d1), 0)
                else:
                    xq = xq * p.q
            coeffs[p.name] = blocks.from_blocks(xq, *p.shape)

    return coeffs


def _pyramid_from_coeffs(coeffs, nlev):
    pyr = []
    for lvl in range(nlev):
        entry = {o: coeffs[f"{o}{lvl}"] for o in ("V", "H", "D")}
        if lvl == nlev - 1:
            entry["L"] = coeffs["L"]
        pyr.append(entry)
    return pyr


def _streams_to_coeffs(plans, L, nlev, image_tables, tctx,
                       wordsA, states, stream16, sparse=False,
                       packed=False, recon=False):
    """Shared decoder head: parsed stream arrays -> band coefficients.

    `image_tables` marks static section CANDIDACY (must match the
    encoder's _use_image_tables); candidates run the modulated path
    unconditionally — an absent section unpacks to all-zero deltas, and
    modulate(fine, stat, stat) == fine exactly, so the same graph decodes
    both per-image-table and static streams."""
    recon_nibs = None
    if recon:
        idx = jnp.arange(16)
        recon_nibs = ((wordsA[idx // 8] >> (4 * (idx % 8))) & 15).astype(
            jnp.int32)
        wordsA = wordsA[2:]
    if image_tables:
        q_img = _unpack_table_section(wordsA, jnp.asarray(tctx["coarse"]))
        dtables = _modulated_tables(tctx, q_img)
    else:
        dtables = tctx["dense"]
    return _decode_bands(plans, L, dtables, states, stream16, nlev,
                         sparse=sparse, packed=packed,
                         recon_nibs=recon_nibs)


def _table_bucket(cfg: CodecConfig) -> int:
    """Rate-regime bucket for the static table sets. The video path sets
    an explicit q_step from its own ladder (its residuals are sparse
    bucket-3-class content) while cfg.quant carries the small video
    index — keying the bucket on the step keeps the statistics matched
    (round-3 coded 720p residuals with dense bucket-1 tables)."""
    if cfg.q_step >= 256:
        return 3
    return tbl.rate_bucket(cfg.quant)


def _sparse_decode(cfg: CodecConfig) -> bool:
    """Static gate for the sparse scan modes: by q=14 (and for all sparse
    video residual steps) the R/D kill leaves well under half the
    worst-case slots active, which is where row skipping beats dense
    scans."""
    return cfg.quant >= 14 or cfg.q_step >= 256


def _packed_mode(cfg: CodecConfig) -> bool:
    """Rank-packed sectioned scans: active slots compact to the grid
    front, so trip counts track the true symbol count and small lane
    grids stay fast. The compaction/expansion passes walk the worst-case
    grid a handful of times, which is noise for small planes but beats
    the row-skip layout only below ~4 Mpix (measured: 4096^2 q20 decode
    325 -> 139 Mpix/s packed vs row-skip — clustered sparsity already
    skips whole rows there), so large planes keep the row-skip layout.
    The video path (q_step set) stays on row-skip too: its fused
    per-frame graphs embed encode AND in-loop decode, and the packed
    sections inflated that compile pathologically (42 GB RSS, >1 h)."""
    return (_sparse_decode(cfg) and cfg.q_step < 0
            and cfg.width * cfg.height < (1 << 22))


def build_decode_plane(cfg: CodecConfig, chroma: bool):
    plans, dims = make_plane_plans(cfg, chroma)
    L = _lanes(cfg)
    _check_plane_size(cfg, plans, L)
    transform = Transform(cfg.transform)
    nlev = len(dims)
    image_tables = _use_image_tables(cfg)
    tctx = tbl.get_table_ctx(_table_bucket(cfg), chroma)

    sparse = _sparse_decode(cfg)

    def decode_plane(wordsA, states, stream16):
        coeffs = _streams_to_coeffs(
            plans, L, nlev, image_tables, tctx,
            wordsA, states, stream16, sparse=sparse,
            packed=_packed_mode(cfg), recon=_recon_offsets(cfg))
        pyr = _pyramid_from_coeffs(coeffs, nlev)
        return lifting.idwt(pyr, cfg.width, cfg.height, transform)

    return jax.jit(decode_plane)


# --------------------------------------------------------------------------
# Archival profile: the same section structure through the native serial
# ADAPTIVE range coder (max compression; C++ host backend).
# --------------------------------------------------------------------------


def _archival_seed(cfg: CodecConfig, chroma: bool = False) -> np.ndarray:
    """Fine static tables seed the serial coder's count-adaptive models."""
    return tbl.fine_np(_table_bucket(cfg), chroma)


@functools.lru_cache(maxsize=16)
def _cached_archival_front(cfg: CodecConfig, chroma: bool):
    """jit: x -> flat per-band payload tensors for host-serial coding."""
    plans, _ = make_plane_plans(cfg, chroma)

    def front(x):
        payload = _plane_payload(cfg, plans, x)
        out = []
        for pay in payload:
            p = pay["plan"]
            sctx = (pay["sctxf"][..., None]
                    * jnp.ones((1, 1, 16), jnp.int32))
            parts = _ref_split(pay["field"].ravel(), pay["flen"].ravel(),
                               _ref_phases(p))
            ksym = pay["k"] - (1 if p.kind == "high" else 0)
            ctxA, ctxB = _cb_split(pay["ctx"], 0)
            zA, zB = _cb_split(pay["z"], 0)
            zaA, zaB = _cb_split(pay["z_act"], False)
            sgA, sgB = _cb_split(pay["sig"], False)
            ksA, ksB = _cb_split(ksym, 0)
            _, nbqB = _cb_split(pay["nbq"], 0)
            tidB = ctxB * tbl.NBQ + nbqB
            out.append((
                zA.ravel(), ctxA.ravel(), zaA.ravel(),
                ksA.ravel(), sgA.ravel(),
                zB.ravel(), tidB.ravel(), zaB.ravel(),
                ksB.ravel(), sgB.ravel(), pay["sig"].ravel(),
                pay["pat_va"].ravel(), pay["pat_wa"].ravel(),
                pay["pat_vb"].ravel(), pay["pat_wb"].ravel(),
                pay["s"].ravel(), sctx.ravel(), pay["active"].ravel(),
                tuple(parts),
            ))
        return out

    return jax.jit(front)


def encode_plane_archival(x, cfg: CodecConfig, chroma: bool):
    """Returns (streamA, streamB): A empty, B = serial range-coded plane."""
    from ric_tpu.utils import native

    plans, _ = make_plane_plans(cfg, chroma)
    bands = _cached_archival_front(cfg, chroma)(jnp.asarray(x, jnp.int32))
    enc = native.SerialEncoder(_archival_seed(cfg, chroma))
    for pay, p in zip(bands, plans):
        (zA, ctxA, zaA, ksA, sgA, zB, tidB, zaB, ksB, sgB, sig,
         pva, pwa, pvb, pwb, s, sctx, act, parts) = pay
        zb, kb, sb = _plan_bases(p)
        zbB, kbB = _plan_bases_b(p)
        enc.put(np.asarray(zA), zb + np.asarray(ctxA), np.asarray(zaA))
        enc.put(np.clip(np.asarray(ksA), 0, 31), kb + np.asarray(ctxA),
                np.asarray(sgA))
        enc.put(np.asarray(zB), zbB + np.asarray(tidB), np.asarray(zaB))
        enc.put(np.clip(np.asarray(ksB), 0, 31), kbB + np.asarray(tidB),
                np.asarray(sgB))
        enc.put_raw(np.asarray(pva), np.asarray(pwa), np.asarray(sig))
        enc.put_raw(np.asarray(pvb), np.asarray(pwb), np.asarray(sig))
        enc.put(np.asarray(s), sb + np.asarray(sctx), np.asarray(act))
        for v, w in parts:
            enc.put_raw(np.asarray(v), np.asarray(w), np.asarray(act))
    return b"", enc.finish()


# The archival decode graph is compiled ONCE per (cfg, chroma); the
# serial coder it pulls symbols from changes per stream, so the ordered
# io_callbacks reach it through this module-level slot instead of closing
# over a decoder instance (which would bake it into the compiled graph).
_ACTIVE_ARCHIVAL_DEC = None


class ArchivalReader:
    """Serial-decoder-backed symbol reader: every read is an ORDERED host
    callback into the native adaptive range decoder, so the whole per-band
    math around the reads compiles into one XLA graph (the round-3 eager
    per-band flow ran hundreds of per-op dispatches per plane — 0.4 Mpix/s
    decode, VERDICT r3 weak #4)."""

    def read_model(self, shape, tid, act):
        from jax.experimental import io_callback

        tid_b = jnp.broadcast_to(jnp.asarray(tid, jnp.int32), shape)
        act_b = jnp.broadcast_to(act, shape)

        def host(tids, acts):
            out = _ACTIVE_ARCHIVAL_DEC.get(
                np.asarray(tids).ravel(), np.asarray(acts).ravel())
            return out.reshape(shape).astype(np.int32)

        return io_callback(
            host, jax.ShapeDtypeStruct(shape, jnp.int32), tid_b, act_b,
            ordered=True)

    def read_raw(self, shape, widths, act):
        from jax.experimental import io_callback

        w_b = jnp.broadcast_to(jnp.asarray(widths, jnp.int32), shape)
        act_b = jnp.broadcast_to(act, shape)

        def host(ws, acts):
            out = _ACTIVE_ARCHIVAL_DEC.get_raw(
                np.asarray(ws).ravel(), np.asarray(acts).ravel())
            return out.reshape(shape).astype(np.int32)

        return io_callback(
            host, jax.ShapeDtypeStruct(shape, jnp.int32), w_b, act_b,
            ordered=True)


@functools.lru_cache(maxsize=16)
def _cached_archival_decoder(cfg: CodecConfig, chroma: bool):
    plans, dims = make_plane_plans(cfg, chroma)
    L = _lanes(cfg)
    nlev = len(dims)
    reader = ArchivalReader()

    def dec():
        coeffs = _decode_bands(
            plans, L, None, None, None, nlev, reader=reader)
        pyr = _pyramid_from_coeffs(coeffs, nlev)
        return lifting.idwt(pyr, cfg.width, cfg.height,
                            Transform(cfg.transform))

    return jax.jit(dec)


def decode_plane_archival(streamA: bytes, streamB: bytes, cfg: CodecConfig,
                          chroma: bool) -> np.ndarray:
    global _ACTIVE_ARCHIVAL_DEC
    from ric_tpu.utils import native

    dec = native.SerialDecoder(_archival_seed(cfg, chroma), streamB)
    _ACTIVE_ARCHIVAL_DEC = dec
    try:
        # the serial coder is host state: keep the graph (and its ordered
        # callbacks) on the host platform even when a TPU is the default
        with jax.default_device(jax.devices("cpu")[0]):
            out = _cached_archival_decoder(cfg, chroma)()
            out = np.asarray(out)
    finally:
        _ACTIVE_ARCHIVAL_DEC = None
        dec.close()
    return out


# --------------------------------------------------------------------------
# Whole-image encode/decode (color transform + container)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _cached_encoder(cfg: CodecConfig, chroma: bool):
    return build_encode_plane(cfg, chroma)


@functools.lru_cache(maxsize=32)
def _cached_decoder(cfg: CodecConfig, chroma: bool):
    return build_decode_plane(cfg, chroma)


def rgb_to_ycocg(img, shift: int):
    """Reversible YCoCg (reference ric.cpp:76-91). img: (H,W,3) int32 RGB.
    Returns (Y, Co, Cg)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    co = r - b
    t = b + (co >> 1)
    cg = g - t
    y = t + (cg >> 1) - 128
    if shift > 0:
        co = co << (shift - 1)
        cg = cg << (shift - 1)
        y = y << shift
    return y, co, cg


def ycocg_to_rgb(y, co, cg, shift: int):
    """Inverse (reference ric.cpp:93-112)."""
    if shift > 0:
        co = (co + (1 << (shift - 2))) >> (shift - 1)
        cg = (cg + (1 << (shift - 2))) >> (shift - 1)
        y = (y + (1 << (shift - 1))) >> shift
    t = y - (cg >> 1) + 128
    g = cg + t
    b = t - (co >> 1)
    r = co + b
    out = jnp.stack([r, g, b], axis=-1)
    if shift > 0:
        out = jnp.clip(out, 0, 255)
    return out


def ycocg_to_yv12(y, co, cg, offset: int = -128):
    """Working-domain YCoCg planes (Y<<4 with `offset`, Co/Cg<<3) ->
    (Y', V, U) 8-bit planes with 2x2-subsampled chroma — the reference's
    fixed-point BT-ish matrix, CImage::outputYV12<char,false>
    (image.cpp:148-188). H and W must be even. The reference stores the
    result into chars without clamping; we clamp to [0, 255]."""
    sh = 4  # 12 -> 8 bit
    off = offset << 4
    yp = ((440 * (y - off) + 82 * co + 76 * cg + (1 << (8 + sh)))
          >> (9 + sh)) + 16

    def sum4(p):
        return (p[0::2, 0::2] + p[0::2, 1::2]
                + p[1::2, 0::2] + p[1::2, 1::2])

    co4, cg4 = sum4(co), sum4(cg)
    u = ((-150 * co4 - 148 * cg4 + (1 << (9 + sh))) >> (10 + sh)) + 128
    v = ((130 * co4 - 188 * cg4 + (1 << (9 + sh))) >> (10 + sh)) + 128
    clip = lambda p: jnp.clip(p, 0, 255).astype(jnp.uint8)
    return clip(yp), clip(v), clip(u)


def words_to_bytes(words, total_bits: int) -> bytes:
    """Dump a device word array's leading total_bits as wire bytes
    (dtype-generic: stream B is uint16, stream A uint32 — row-major
    little-endian bytes are the wire layout either way)."""
    ibits = words.dtype.itemsize * 8
    nw = (int(total_bits) + ibits - 1) // ibits
    # bucket the device slice so eager-op shapes stay cacheable across
    # images with different stream lengths
    bucket = min(-(-max(nw, 1) // (1 << 18)) * (1 << 18), words.shape[0])
    host = np.asarray(words[:bucket])
    return host[:nw].tobytes()


def bytes_to_words(data: bytes, cap: int) -> np.ndarray:
    pad = (-len(data)) % 4
    buf = np.frombuffer(data + b"\x00" * pad, dtype="<u4")
    out = np.zeros(cap, dtype=np.uint32)
    out[: len(buf)] = buf
    return out


def encode_plane_bytes(x, cfg: CodecConfig, chroma: bool):
    """Returns (streamA, streamB) bytes."""
    enc = _cached_encoder(cfg, chroma)
    wA, tA, wB, tB = enc(jnp.asarray(x, jnp.int32))
    return words_to_bytes(wA, int(tA)), words_to_bytes(wB, int(tB))


def _to_device_padded(buf: np.ndarray, cap: int):
    """Ship only the real payload to the device; zero-pad to the static cap
    there. Transfer sizes are bucketed (256K words) so eager-op shapes stay
    cacheable."""
    n = min(len(buf), cap)
    bucket = -(-max(n, 1) // (1 << 18)) * (1 << 18)
    bucket = min(bucket, cap)
    host = np.zeros(bucket, buf.dtype)
    host[:n] = buf[:n]
    dev = jnp.asarray(host)
    if bucket < cap:
        dev = jnp.concatenate(
            [dev, jnp.zeros(cap - bucket, buf.dtype)])
    return dev


def decode_plane_bytes(streamA: bytes, streamB: bytes, cfg: CodecConfig,
                       chroma: bool) -> np.ndarray:
    dec = _cached_decoder(cfg, chroma)
    plans, _ = make_plane_plans(cfg, chroma)
    L = _lanes(cfg)
    capA = _cap_words_a(cfg)
    pad = (-len(streamA)) % 4
    bufA = np.frombuffer(streamA + b"\x00" * pad, dtype="<u4")
    wordsA = np.zeros(capA, np.uint32)
    wordsA[: min(len(bufA), capA)] = bufA[:capA]
    b32 = np.frombuffer(
        streamB[: 4 * L] + b"\x00" * max(4 * L - len(streamB), 0), "<u4")
    states = b32[:L].astype(np.uint32)
    padB = (-len(streamB)) % 2
    w16 = np.frombuffer(streamB[4 * L:] + b"\x00" * padB, "<u2")
    cap16 = _cap_words16(plans, L) + L + 8
    out = dec(
        jnp.asarray(wordsA),
        jnp.asarray(states),
        _to_device_padded(w16.astype(np.uint32), cap16),
    )
    return np.asarray(out)


@functools.lru_cache(maxsize=16)
def _cached_batch_encoder(cfg: CodecConfig, chroma: bool):
    return jax.jit(jax.vmap(build_encode_plane(cfg, chroma)))


@functools.lru_cache(maxsize=16)
def _cached_batch_decoder(cfg: CodecConfig, chroma: bool):
    return jax.jit(jax.vmap(build_decode_plane(cfg, chroma)))


def _dp_shard(x, mesh):
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(
        x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))


def encode_batch(imgs: np.ndarray, cfg: CodecConfig, mesh=None) -> list[bytes]:
    """Data-parallel batch encode of (B, H, W) grayscale or (B, H, W, 3)
    RGB images (8- or 16-bit per cfg.input_depth).

    With a mesh, the batch axis is sharded over its 'dp' axis; without one,
    the batch is vmapped on a single device. Returns one RTP1 container per
    image."""
    imgs = jnp.asarray(imgs, jnp.int32)
    if cfg.channels == 3:
        y, co, cg = rgb_to_ycocg(imgs, 0 if cfg.lossless else SHIFT)
        ys = _cached_batch_encoder(cfg, False)(_dp_shard(y, mesh))
        cgs = _cached_batch_encoder(cfg, True)(_dp_shard(cg, mesh))
        cos = _cached_batch_encoder(cfg, True)(_dp_shard(co, mesh))
        out = []
        for i in range(imgs.shape[0]):
            streams = []
            for wA, tA, wB, tB in (ys, cgs, cos):
                streams.append(words_to_bytes(wA[i], int(tA[i])))
                streams.append(words_to_bytes(wB[i], int(tB[i])))
            out.append(container.write_container(cfg, streams))
        return out
    mid = 1 << (cfg.input_depth - 1)
    # same depth logic as encode_image: 16-bit input already exceeds the
    # 12-bit lossy working domain, so only 8-bit lossy input gets SHIFT
    if cfg.lossless or cfg.input_depth != 8:
        x = imgs - mid
    else:
        x = (imgs - mid) << SHIFT
    x = _dp_shard(x, mesh)
    fn = _cached_batch_encoder(cfg, False)
    wA, tA, wB, tB = fn(x)
    out = []
    for i in range(imgs.shape[0]):
        streams = [
            words_to_bytes(wA[i], int(tA[i])),
            words_to_bytes(wB[i], int(tB[i])),
        ]
        out.append(container.write_container(cfg, streams))
    return out


def _batch_stream_arrays(cfg: CodecConfig, pairs):
    """Stack per-image (streamA, streamB) byte pairs into padded device
    arrays for the vmapped decoder."""
    plans, _ = make_plane_plans(cfg, False)
    L = _lanes(cfg)
    capA = _cap_words_a(cfg)
    cap16 = _cap_words16(plans, L) + L + 8
    B = len(pairs)
    wA = np.zeros((B, capA), np.uint32)
    states = np.zeros((B, L), np.uint32)
    s16 = np.zeros((B, cap16), np.uint32)
    for i, (a, b) in enumerate(pairs):
        bufA = np.frombuffer(a + b"\x00" * ((-len(a)) % 4), "<u4")
        wA[i, : min(len(bufA), capA)] = bufA[:capA]
        b32 = np.frombuffer(
            b[: 4 * L] + b"\x00" * max(4 * L - len(b), 0), "<u4")
        states[i] = b32[:L]
        body = np.frombuffer(
            b[4 * L :] + b"\x00" * ((-(len(b) - 4 * L)) % 2), "<u2")
        s16[i, : len(body)] = body
    return wA, states, s16


def decode_batch(datas: list[bytes], mesh=None) -> np.ndarray:
    """Decode twin of encode_batch: a list of same-config RTP1 containers
    -> (B, H, W) or (B, H, W, 3) pixel array. With a mesh the batch axis is
    dp-sharded."""
    parsed = [container.read_container(d) for d in datas]
    cfg = parsed[0][0]
    for c, _, tiles, arch, _m2, _d in parsed:
        if c != cfg or tiles != (1, 1) or arch:
            raise ValueError("decode_batch needs same-config untiled "
                             "rans-profile containers")

    def run(chroma, pairs):
        wA, states, s16 = _batch_stream_arrays(cfg, pairs)
        fn = _cached_batch_decoder(cfg, chroma)
        return fn(
            _dp_shard(jnp.asarray(wA), mesh),
            _dp_shard(jnp.asarray(states), mesh),
            _dp_shard(jnp.asarray(s16), mesh),
        )

    if cfg.channels == 3:
        y = run(False, [(p[1][0], p[1][1]) for p in parsed])
        cg = run(True, [(p[1][2], p[1][3]) for p in parsed])
        co = run(True, [(p[1][4], p[1][5]) for p in parsed])
        rgb = ycocg_to_rgb(y, co, cg, 0 if cfg.lossless else SHIFT)
        return np.asarray(rgb).astype(np.int32)
    x = np.asarray(run(False, [(p[1][0], p[1][1]) for p in parsed]))
    mid = 1 << (cfg.input_depth - 1)
    peak = (1 << cfg.input_depth) - 1
    if cfg.lossless:
        return (x + mid).astype(np.int32)
    if cfg.input_depth == 8:
        x = mid + ((x + (1 << (SHIFT - 1))) >> SHIFT)
    else:
        x = x + mid
    return np.clip(x, 0, peak).astype(np.int32)


def encode_image(img: np.ndarray, cfg: CodecConfig,
                 profile: str = "rans", check: bool = True) -> bytes:
    """img: (H,W) or (H,W,3) uint8/uint16. Returns RTP1 container bytes.

    profile: "rans" (parallel, default) or "archival" (serial adaptive
    range coder via the native backend — max compression).
    check=False drops the slim container CRC (4 B) — the envelope the
    reference ships; see utils/container.py."""
    img = jnp.asarray(img).astype(jnp.int32)
    enc = (
        encode_plane_archival if profile == "archival" else encode_plane_bytes
    )
    streams = []
    if cfg.channels == 3:
        y, co, cg = rgb_to_ycocg(img, 0 if cfg.lossless else SHIFT)
        streams += list(enc(y, cfg, chroma=False))
        streams += list(enc(cg, cfg, chroma=True))
        streams += list(enc(co, cfg, chroma=True))
    else:
        mid = 1 << (cfg.input_depth - 1)
        if cfg.lossless:
            x = img - mid
        elif cfg.input_depth == 8:
            x = (img - mid) << SHIFT
        else:
            # 16-bit input already exceeds the 12-bit lossy working domain
            x = img - mid
        streams += list(enc(x, cfg, chroma=False))
    return container.write_container(
        cfg, streams, archival=(profile == "archival"), check=check
    )


def encode_image_tiles(img: np.ndarray, cfg: CodecConfig,
                       tiles: tuple[int, int]) -> bytes:
    """Single-device tiled encode: a host loop over a (tx, ty) tile grid,
    all tiles sharing one compiled per-tile graph. This is how images past
    the single-tile int32 stream ceiling (PlaneTooLarge; e.g. 16k x 16k)
    encode on ONE chip; with a device mesh use
    parallel.tiling.encode_image_tiled_container instead. The container is
    the same mode-1 tiled format either way; decode_image routes it."""
    tx, ty = tiles
    img = np.asarray(img)
    h, w = img.shape[:2]
    tw, th = -(-w // tx), -(-h // ty)
    if (tx * tw, ty * th) != (w, h):
        pad = ((0, ty * th - h), (0, tx * tw - w)) + ((0, 0),) * (img.ndim - 2)
        img = np.pad(img, pad, mode="edge")
    tcfg = dataclasses.replace(cfg, width=tw, height=th)
    streams = []
    for j in range(ty):
        for i in range(tx):
            tile = img[j * th : (j + 1) * th, i * tw : (i + 1) * tw]
            x32 = jnp.asarray(tile).astype(jnp.int32)
            if cfg.channels == 3:
                y, co, cg = rgb_to_ycocg(x32, 0 if cfg.lossless else SHIFT)
                streams += list(encode_plane_bytes(y, tcfg, chroma=False))
                streams += list(encode_plane_bytes(cg, tcfg, chroma=True))
                streams += list(encode_plane_bytes(co, tcfg, chroma=True))
            else:
                mid = 1 << (cfg.input_depth - 1)
                if cfg.lossless or cfg.input_depth != 8:
                    x = x32 - mid
                else:
                    x = (x32 - mid) << SHIFT
                streams += list(encode_plane_bytes(x, tcfg, chroma=False))
    return container.write_container(cfg, streams, tiles=tiles)


def decode_plane_streams(streams: list[bytes], cfg: CodecConfig,
                         archival: bool = False,
                         dither: bool = False) -> np.ndarray:
    """Decode one plane-set's substreams ([A,B] gray or
    [Ay,By,Acg,Bcg,Aco,Bco] color) back to pixel-domain samples."""
    dec = decode_plane_archival if archival else decode_plane_bytes
    if cfg.channels == 3:
        y = dec(streams[0], streams[1], cfg, chroma=False)
        cg = dec(streams[2], streams[3], cfg, chroma=True)
        co = dec(streams[4], streams[5], cfg, chroma=True)
        rgb = ycocg_to_rgb(
            jnp.asarray(y), jnp.asarray(co), jnp.asarray(cg),
            0 if cfg.lossless else SHIFT,
        )
        return np.asarray(rgb).astype(np.int32)
    x = dec(streams[0], streams[1], cfg, chroma=False)
    mid = 1 << (cfg.input_depth - 1)
    peak = (1 << cfg.input_depth) - 1
    if cfg.lossless:
        return (x + mid).astype(np.int32)
    if cfg.input_depth == 8:
        if dither == "bayer":
            from ric_tpu.cli import dither as _dither

            return _dither(np.asarray(x)).astype(np.int32)
        if dither:  # True / "ed": serpentine error diffusion (native)
            from ric_tpu.utils.native import dither_ed

            return dither_ed(np.asarray(x)).astype(np.int32)
        x = mid + ((x + (1 << (SHIFT - 1))) >> SHIFT)
    else:
        x = x + mid
    return np.clip(x, 0, peak).astype(np.int32)


def decode_image(data: bytes, dither: bool = False) -> np.ndarray:
    (cfg, streams, tiles, archival, mode2,
     dctp) = container.read_container(data)
    if dctp:
        from ric_tpu.models import dct_codec

        return dct_codec.decode_image_dct(cfg, streams)
    if tiles != (1, 1):
        # tiled containers carry per-tile substreams; route to the tiled
        # decoder (parallel/tiling.py) which reconstructs per-tile configs
        from ric_tpu.parallel import tiling

        if mode2:
            return tiling.decode_container_tiled_global(cfg, streams, tiles)
        return tiling.decode_container_tiled(cfg, streams, tiles)
    return decode_plane_streams(streams, cfg, archival=archival,
                                dither=dither)
