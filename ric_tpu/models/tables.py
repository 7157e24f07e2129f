"""Static rANS context tables (the TPU analogue of the reference's baked
Huffman tables, bandcodec.cpp:607-745, and its adaptive bit/geo models).

Two context spaces (round-3 redesign, driven by tools/ctx_probe.py):

FINE (what the scans actually code with; 480 tables, alphabet-padded 32):
  ZF + (lvlc*3+orient)*16 + parML   zerotree bit        (144 tables)
  KLF + ((lvlc-1)*3+orient)*16 + parML  k of low bands  (96)
  KHF + orient*16 + parML           k-1 of finest bands (48)
  SF + lvlc*64 + pml4*16 + min(k-1,15)   size class     (192)
where parML = bitlen of max parent 2x2 magnitude (the reference maxLen,
bandcodec.cpp:324-344), pml4 = its 4-class quantization
((pml>0)+(pml>2)+(pml>5) — the S scan's fetch stays 64 rows wide; a full
16-class parML slowed the dense SREF scan 2.6x for ~0.3% rate),
lvlc = min(level, 2) (0 = finest), orient V/H/D = 0/1/2. Level and
orientation are STATIC per band, so the scans only ever one-hot over a
16- or 64-row slice — richer context costs no stream bytes and almost no
device time. Probe-measured gain vs the round-2 coarse
contexts: ~2-3%% of total stream across q0..q21 (leave-one-out fit).

COARSE (the per-image two-pass table section; 64 tables — the round-2
layout, kept as the section space so per-image adaptation stays ~1 KB):
  Z  + parML | KL + parML | KH + parML | S + min(k-1,15)
Per-image coarse tables RATIO-MODULATE the fine static tables
deterministically on both sides (see image_codec): fine structure from the
corpus fit, image-level shifts from the two-pass histogram.

Priors are analytically seeded; tools/tablegen.py refits from corpus
histograms into tables.npz, which is part of the bitstream format.
"""
from __future__ import annotations

import functools
import os

import numpy as np

from ric_tpu.ops import rans

ALPHABET = 32

# coarse (section) space
Z_BASE, KL_BASE, KH_BASE, S_BASE = 0, 16, 32, 48
N_TABLES = 64

# fine (scan) space. Round 4 adds the checkerboard pass-B rows: blocks
# with (by+bx) odd are coded in a second ZK pass whose context extends
# parML with NBQ classes of the quantized mean of the four already-decoded
# neighbor k values (all four neighbors of an odd-parity block are
# even-parity, so a parallel decoder has them after pass A — the causal
# answer to the reference's serial k_mean context, bandcodec.cpp:480-490).
NBQ = 6
NBQ_THRESH = (0, 1, 3, 6, 10)
ZF_BASE = 0
KLF_BASE = 144
KHF_BASE = 240
SF_BASE = 288
ZB_BASE = 480           # pass-B zerotree: (lvlc*3+orient) * 96 + pml*6+nbq
KLB_BASE = 480 + 864    # pass-B k, low bands
KHB_BASE = 480 + 864 + 576  # pass-B k, finest bands
# full-parML S rows (lvlc * 256 + pml*16 + min(k-1,15)): planes < 4 Mpix
# scan with the 16-class parent context (probe: the 4-class quantization
# captures ~none of parML's S-stream value; the full context is worth
# ~1.5%/1% of stream at q9/q13) — large planes keep the 64-row pml4
# fetch for scan speed.
SF16_BASE = 480 + 864 + 576 + 288
N_FINE = SF16_BASE + 768

# RIC_TABLES overrides the shipped table set (held-out-split experiments,
# tools/tablegen.py --out; the override changes the bitstream format, so
# streams written under it decode only under the same tables)
_NPZ = os.environ.get("RIC_TABLES") or os.path.join(
    os.path.dirname(__file__), "tables.npz")


def z_fine_base(lvlc: int, orient: int) -> int:
    return ZF_BASE + (lvlc * 3 + orient) * 16


def kl_fine_base(lvlc: int, orient: int) -> int:
    return KLF_BASE + ((max(lvlc, 1) - 1) * 3 + orient) * 16


def kh_fine_base(orient: int) -> int:
    return KHF_BASE + orient * 16


def s_fine_base(lvlc: int) -> int:
    return SF_BASE + lvlc * 64


def zb_fine_base(lvlc: int, orient: int) -> int:
    """Pass-B zerotree rows: 96 per (lvlc, orient) = parML(16) x nbq(6)."""
    return ZB_BASE + (lvlc * 3 + orient) * 96


def klb_fine_base(lvlc: int, orient: int) -> int:
    return KLB_BASE + ((max(lvlc, 1) - 1) * 3 + orient) * 96


def khb_fine_base(orient: int) -> int:
    return KHB_BASE + orient * 96


def s16_fine_base(lvlc: int) -> int:
    return SF16_BASE + lvlc * 256


def _fine_layout():
    """Per fine row: (coarse row, alphabet size, pass-A twin row).

    The pass-A twin of a pass-B row is the same (lvlc, orient, parML) row
    without the nbq dim — used to seed pass-B priors and to migrate
    480-row (round-3) table fits into this layout."""
    coarse = np.zeros(N_FINE, np.int32)
    nsym = np.zeros(N_FINE, np.int32)
    twin = np.arange(N_FINE, dtype=np.int32)
    for lvlc in range(3):
        for o in range(3):
            b = z_fine_base(lvlc, o)
            coarse[b : b + 16] = Z_BASE + np.arange(16)
            nsym[b : b + 16] = 2
    for lc in range(2):
        for o in range(3):
            b = KLF_BASE + (lc * 3 + o) * 16
            coarse[b : b + 16] = KL_BASE + np.arange(16)
            nsym[b : b + 16] = 17
    for o in range(3):
        b = kh_fine_base(o)
        coarse[b : b + 16] = KH_BASE + np.arange(16)
        nsym[b : b + 16] = 16
    for lvlc in range(3):
        b = s_fine_base(lvlc)
        for pml in range(4):
            r = b + pml * 16
            coarse[r : r + 16] = S_BASE + np.arange(16)
            nsym[r : r + 16] = ALPHABET
    # pass-B rows: parML-major, NBQ-minor; coarse row ignores the nbq dim
    # (the per-image section modulates both passes through one coarse shift)
    pml_of = np.repeat(np.arange(16), NBQ)
    for lvlc in range(3):
        for o in range(3):
            b = zb_fine_base(lvlc, o)
            coarse[b : b + 96] = Z_BASE + pml_of
            nsym[b : b + 96] = 2
            twin[b : b + 96] = z_fine_base(lvlc, o) + pml_of
    for lc in range(1, 3):
        for o in range(3):
            b = klb_fine_base(lc, o)
            coarse[b : b + 96] = KL_BASE + pml_of
            nsym[b : b + 96] = 17
            twin[b : b + 96] = kl_fine_base(lc, o) + pml_of
    for o in range(3):
        b = khb_fine_base(o)
        coarse[b : b + 96] = KH_BASE + pml_of
        nsym[b : b + 96] = 16
        twin[b : b + 96] = kh_fine_base(o) + pml_of
    # SF16: pml-major, k-class minor; twin = the pml4-quantized row
    kc = np.tile(np.arange(16), 16)
    pml = np.repeat(np.arange(16), 16)
    pml4 = (pml > 0).astype(np.int64) + (pml > 2) + (pml > 5)
    for lvlc in range(3):
        b = s16_fine_base(lvlc)
        coarse[b : b + 256] = S_BASE + kc
        nsym[b : b + 256] = ALPHABET
        twin[b : b + 256] = s_fine_base(lvlc) + pml4 * 16 + kc
    return coarse, nsym, twin




COARSE_OF, _FINE_NSYM, _TWIN_OF = _fine_layout()

_VALID_FINE = np.zeros((N_FINE, ALPHABET), bool)
for _r in range(N_FINE):
    _VALID_FINE[_r, : _FINE_NSYM[_r]] = True

_VALID = np.zeros((N_TABLES, ALPHABET), bool)
_VALID[Z_BASE : Z_BASE + 16, :2] = True
_VALID[KL_BASE : KL_BASE + 16, :17] = True
_VALID[KH_BASE : KH_BASE + 16, :16] = True
_VALID[S_BASE : S_BASE + 16, :] = True


def _prior_counts_coarse() -> np.ndarray:
    counts = np.zeros((N_TABLES, ALPHABET), np.float64)
    p_insig = np.array(
        [0.75, 0.62, 0.50, 0.38, 0.28, 0.20, 0.14, 0.10,
         0.08, 0.06, 0.05, 0.04, 0.04, 0.03, 0.03, 0.35]
    )
    for c in range(16):
        counts[Z_BASE + c, 0] = 1.0 - p_insig[c]
        counts[Z_BASE + c, 1] = p_insig[c]
    k_mean = np.array([1.5, 2, 3, 4, 6, 8, 10, 12, 13, 14, 14, 15, 15, 15, 15, 6])
    ks = np.arange(17, dtype=np.float64)
    for c in range(16):
        w = np.exp(-np.abs(ks - k_mean[c]) / 2.5)
        counts[KL_BASE + c, :17] = w
        counts[KH_BASE + c, :16] = np.exp(
            -np.abs(np.arange(16) - max(k_mean[c] - 1, 0)) / 2.5
        )
    s = np.arange(ALPHABET, dtype=np.float64)
    for c in range(16):
        scale = 0.8 + 0.12 * c
        counts[S_BASE + c] = np.exp(-s / scale)
    return counts


def _prior_counts() -> np.ndarray:
    """Fine prior = coarse prior broadcast through the projection."""
    coarse = _prior_counts_coarse()
    return coarse[COARSE_OF] * _VALID_FINE


# Rate-regime buckets: symbol statistics shift strongly with the quantizer
# (lossless streams are dense, q>=15 streams are nearly-all-zerotree), so
# each regime gets its own fitted table set, selected statically by config
# — zero per-stream header cost.
N_BUCKETS = 4


def rate_bucket(quant: int) -> int:
    if quant == 0:
        return 0
    if quant < 8:
        return 1
    if quant < 15:
        return 2
    return 3


@functools.lru_cache(maxsize=1)
def _all_counts() -> np.ndarray:
    """(2, N_BUCKETS, N_FINE, ALPHABET): luma- and chroma-fitted sets.

    Chroma planes see the +8 quant boost (C_Q_BOOST) and much sparser
    residuals, so they get their own fitted tables per rate bucket —
    still selected statically from config, zero per-stream header cost."""
    if os.path.exists(_NPZ):
        data = np.load(_NPZ)["counts"]
        if data.ndim == 4 and data.shape[1:] == (N_BUCKETS, N_FINE, ALPHABET):
            return data
        if data.ndim == 4 and data.shape[2] < N_FINE and (
                data.shape[1], data.shape[3]) == (N_BUCKETS, ALPHABET):
            # round-3 480-row fit: seed every pass-B row from its pass-A
            # twin (neutral w.r.t. nbq) until tablegen refits the full set
            full = data[:, :, _TWIN_OF[: N_FINE]]
            full[:, :, : data.shape[2]] = data
            return full
    return np.broadcast_to(
        _prior_counts(), (2, N_BUCKETS, N_FINE, ALPHABET)
    ).copy()


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_freqs(bucket: int = 0, chroma: bool = False) -> bytes:
    """FINE frequencies as a hashable bytes blob ((N_FINE, 32) int32)."""
    counts = _all_counts()[1 if chroma else 0][bucket]
    freqs = rans.normalize_freqs(counts, _VALID_FINE)
    return freqs.astype(np.int32).tobytes()


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_coarse_freqs(bucket: int = 0, chroma: bool = False) -> bytes:
    """Static COARSE tables ((N_TABLES, 32) int32): the fine fit projected
    through COARSE_OF then normalized — the reference point both sides use
    for the per-image section delta coding and the ratio modulation."""
    counts = _all_counts()[1 if chroma else 0][bucket]
    coarse = np.zeros((N_TABLES, ALPHABET), np.float64)
    np.add.at(coarse, COARSE_OF, counts)
    freqs = rans.normalize_freqs(coarse, _VALID)
    return freqs.astype(np.int32).tobytes()


def fine_np(bucket: int = 0, chroma: bool = False) -> np.ndarray:
    return np.frombuffer(get_freqs(bucket, chroma), np.int32).reshape(
        N_FINE, ALPHABET)


def coarse_np(bucket: int = 0, chroma: bool = False) -> np.ndarray:
    return np.frombuffer(get_coarse_freqs(bucket, chroma), np.int32).reshape(
        N_TABLES, ALPHABET)


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_tables(bucket: int = 0, chroma: bool = False):
    return rans.build_tables(fine_np(bucket, chroma))


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_dense_tables(bucket: int = 0, chroma: bool = False):
    """v2-engine dense (cum, comb) rows (FINE space) for the scans."""
    return rans.enc_dec_tables(fine_np(bucket, chroma))


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_table_ctx(bucket: int = 0, chroma: bool = False):
    """Everything a codec graph needs for this rate bucket: the dense fine
    scan tables plus the (fine, coarse) static frequency arrays used for
    per-image section delta coding and ratio modulation."""
    return {
        "dense": get_dense_tables(bucket, chroma),
        "fine": fine_np(bucket, chroma),
        "coarse": coarse_np(bucket, chroma),
    }
