"""Static rANS context tables (the TPU analogue of the reference's baked
Huffman tables, bandcodec.cpp:607-745, and its adaptive bit/geo models).

Table map (all alphabet-padded to 32 symbols):
  Z  + ctx(0..15)   zerotree bit, ctx = bitlen(max parent 2x2 magnitude)
  KL + ctx(0..15)   k of low/LL bands (0..16)
  KH + ctx(0..15)   k-1 of finest bands (0..15)
  S  + ctx(0..15)   coeff size class bitlen(mag-1) (0..31), ctx = min(k-1,15)

Priors below are analytically seeded (geometric / humped shapes following
the reference's k_mean init, bandcodec.cpp:488-490); tools/tablegen.py
refits them from corpus histograms and rewrites tables.npz, which takes
precedence when present.
"""
from __future__ import annotations

import functools
import os

import numpy as np

from ric_tpu.ops import rans

ALPHABET = 32
Z_BASE, KL_BASE, KH_BASE, S_BASE = 0, 16, 32, 48
N_TABLES = 64

_NPZ = os.path.join(os.path.dirname(__file__), "tables.npz")


def _prior_counts() -> np.ndarray:
    counts = np.zeros((N_TABLES, ALPHABET), np.float64)
    # Z: p(insignificant) falls as the parent neighborhood gets louder
    p_insig = np.array(
        [0.75, 0.62, 0.50, 0.38, 0.28, 0.20, 0.14, 0.10,
         0.08, 0.06, 0.05, 0.04, 0.04, 0.03, 0.03, 0.35]
    )
    for c in range(16):
        counts[Z_BASE + c, 0] = 1.0 - p_insig[c]
        counts[Z_BASE + c, 1] = p_insig[c]
    # K: humped around a ctx-dependent mean (reference k_mean seeds)
    k_mean = np.array([1.5, 2, 3, 4, 6, 8, 10, 12, 13, 14, 14, 15, 15, 15, 15, 6])
    ks = np.arange(17, dtype=np.float64)
    for c in range(16):
        w = np.exp(-np.abs(ks - k_mean[c]) / 2.5)
        counts[KL_BASE + c, :17] = w
        counts[KH_BASE + c, :16] = np.exp(
            -np.abs(np.arange(16) - max(k_mean[c] - 1, 0)) / 2.5
        )
    # S: geometric decay, heavier tail at higher k context
    s = np.arange(ALPHABET, dtype=np.float64)
    for c in range(16):
        scale = 0.8 + 0.12 * c
        counts[S_BASE + c] = np.exp(-s / scale)
    return counts


_VALID = np.zeros((N_TABLES, ALPHABET), bool)
_VALID[Z_BASE : Z_BASE + 16, :2] = True
_VALID[KL_BASE : KL_BASE + 16, :17] = True
_VALID[KH_BASE : KH_BASE + 16, :16] = True
_VALID[S_BASE : S_BASE + 16, :] = True

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
    """(2, N_BUCKETS, N_TABLES, ALPHABET): luma- and chroma-fitted sets.

    Chroma planes see the +8 quant boost (C_Q_BOOST) and much sparser
    residuals, so they get their own fitted tables per rate bucket —
    still selected statically from config, zero per-stream header cost."""
    if os.path.exists(_NPZ):
        data = np.load(_NPZ)["counts"]
        if data.ndim == 4 and data.shape[:2] == (2, N_BUCKETS):
            return data
        if data.ndim == 3 and data.shape[0] == N_BUCKETS:
            return np.broadcast_to(data, (2,) + data.shape).copy()
        return np.broadcast_to(data, (2, N_BUCKETS) + data.shape).copy()
    return np.broadcast_to(
        _prior_counts(), (2, N_BUCKETS, N_TABLES, ALPHABET)
    ).copy()


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_freqs(bucket: int = 0, chroma: bool = False) -> bytes:
    """Frequencies as a hashable bytes blob (for cache keys)."""
    counts = _all_counts()[1 if chroma else 0][bucket]
    freqs = rans.normalize_freqs(counts, _VALID)
    return freqs.astype(np.int32).tobytes()


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_tables(bucket: int = 0, chroma: bool = False):
    freqs = np.frombuffer(get_freqs(bucket, chroma), np.int32).reshape(
        N_TABLES, ALPHABET
    )
    return rans.build_tables(freqs)


@functools.lru_cache(maxsize=2 * N_BUCKETS)
def get_dense_tables(bucket: int = 0, chroma: bool = False):
    """v2-engine dense (cum, comb) f32 rows for the gather-free scans."""
    freqs = np.frombuffer(get_freqs(bucket, chroma), np.int32).reshape(
        N_TABLES, ALPHABET
    )
    return rans.enc_dec_tables(freqs)
