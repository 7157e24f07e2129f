"""Canonical Huffman VLC: table construction, vectorized encode, LUT
decode — the literal CHuffCodec capability (reference lib/huffcodec.{h,cpp}:
Moffat-Katajainen in-place code-length calculation huffcodec.cpp:83-125,
canonical code assignment :149-160, LUT-accelerated decode :332-362 with
LUT_DEPTH=4, muxcodec.h:39).

The production entropy path is the rANS engine (ops/rans.py) — table-driven
VLC loses the fractional-bit precision and the duplex mux — but the
capability itself is part of the reference surface: static tables for
k-counts (bandcodec.cpp:607-745) and adaptive tables for MV coding
(obmc.cpp:347-350). Here:

  * make_lengths: heap Huffman + Kraft-preserving length limiting
    (covers the reference's make_len contract: optimal prefix-free
    lengths under a depth cap)
  * canonical_codes: first-code-per-length assignment (MSB-first codes)
  * encode: one vectorized pass — per-symbol (code, len) lookup + the
    prefix-sum bitpack (ops/bitpack); millions of symbols, no loops
  * decode_np: host LUT decoder (depth-limited first stage + bit-stepped
    overflow path), the twin of the reference's init_lut

Adaptivity: the reference rebuilds its adaptive Huffman tables every 2^14
weighted counts (huffcodec.cpp:213-236). The equivalent rebuild-from-counts
flow here is make_lengths(counts) re-run at checkpoints; the MV coder uses
the native serial range coder instead (strictly better compression).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ric_tpu.ops import bitpack

LUT_DEPTH = 8


def make_lengths(freqs, max_len: int = 15) -> np.ndarray:
    """Huffman code lengths from symbol frequencies (zero freq -> len 0).

    Package-merge-free construction: standard heap Huffman for the tree
    depths, then heuristic length-limiting that preserves the Kraft sum
    (matches the reference's behavior envelope; its make_len caps at the
    LUT depth implicitly via table design)."""
    freqs = np.asarray(freqs, np.float64)
    n = len(freqs)
    idx = [i for i in range(n) if freqs[i] > 0]
    if not idx:
        return np.zeros(n, np.int32)
    if len(idx) == 1:
        out = np.zeros(n, np.int32)
        out[idx[0]] = 1
        return out
    import heapq

    heap = [(freqs[i], i, None, None) for i in idx]
    heapq.heapify(heap)
    cnt = n
    nodes = {}
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes[cnt] = (a[1], b[1])
        heapq.heappush(heap, (a[0] + b[0], cnt, a[1], b[1]))
        cnt += 1
    root = heap[0][1]
    lens = np.zeros(n, np.int32)

    stack = [(root, 0)]
    while stack:
        node, d = stack.pop()
        if node < n:
            lens[node] = max(d, 1)
        else:
            l, r = nodes[node]
            stack.append((l, d + 1))
            stack.append((r, d + 1))
    # length-limit while keeping Kraft <= 1, then tighten to equality
    lens = np.minimum(lens, max_len)
    active = lens > 0

    def kraft(v):
        return np.sum(np.where(active, 2.0 ** (-v.astype(np.float64)), 0))

    while kraft(lens) > 1.0 + 1e-12:
        # lengthen the longest-but-liftable cheapest symbol
        cand = np.where(active & (lens < max_len), lens, -1)
        j = int(np.argmax(cand))
        lens[j] += 1
    # tighten: shorten symbols while Kraft stays <= 1
    improved = True
    while improved:
        improved = False
        order = np.argsort(-lens)
        for j in order:
            if active[j] and lens[j] > 1:
                trial = lens.copy()
                trial[j] -= 1
                if kraft(trial) <= 1.0 + 1e-12:
                    lens = trial
                    improved = True
                    break
    return lens


def canonical_codes(lengths) -> np.ndarray:
    """MSB-first canonical codes (shorter codes numerically first), the
    reference's make_codes convention (huffcodec.cpp:149-160)."""
    lengths = np.asarray(lengths, np.int32)
    codes = np.zeros_like(lengths, dtype=np.uint32)
    code = 0
    prev_len = 0
    order = np.lexsort((np.arange(len(lengths)), lengths))
    for s in order:
        l = lengths[s]
        if l == 0:
            continue
        code <<= (l - prev_len)
        codes[s] = code
        code += 1
        prev_len = l
    return codes


def encode(symbols, lengths, codes, cap_words: int):
    """Vectorized VLC pack: symbols (N,) int32 -> (words u32, total_bits).
    Bitstream convention: each code's MSB-first bits occupy ascending bit
    offsets (bit-reversed per code so the decoder reads LSB-first)."""
    lengths_j = jnp.asarray(lengths, jnp.int32)
    codes_j = jnp.asarray(codes, jnp.uint32)
    syms = jnp.asarray(symbols, jnp.int32)
    lens = lengths_j[syms]
    cds = codes_j[syms]
    # bit-reverse each code within its length so ascending-offset LSB
    # packing preserves MSB-first decode order
    rev = jnp.zeros_like(cds)
    for b in range(16):
        rev = rev | (((cds >> b) & 1) << jnp.maximum(lens - 1 - b, 0)) * (
            (b < lens).astype(jnp.uint32))
    return bitpack.pack(rev, lens, cap_words)


def build_lut(lengths, codes):
    """(first-stage LUT) prefix of LUT_DEPTH bits -> (symbol, length);
    codes longer than LUT_DEPTH fall back to bit-stepping (rare)."""
    lengths = np.asarray(lengths)
    codes = np.asarray(codes)
    lut_sym = np.full(1 << LUT_DEPTH, -1, np.int32)
    lut_len = np.zeros(1 << LUT_DEPTH, np.int32)
    for s, (l, c) in enumerate(zip(lengths, codes)):
        if l == 0 or l > LUT_DEPTH:
            continue
        base = int(c) << (LUT_DEPTH - l)
        for v in range(1 << (LUT_DEPTH - l)):
            lut_sym[base + v] = s
            lut_len[base + v] = l
    return lut_sym, lut_len


def decode_np(words, n_symbols: int, lengths, codes) -> np.ndarray:
    """Host LUT decoder (reference init_lut fast path + slow path)."""
    words = np.asarray(words, np.uint64)
    lengths = np.asarray(lengths)
    codes = np.asarray(codes)
    lut_sym, lut_len = build_lut(lengths, codes)
    # by-length first-code table for the slow path
    maxl = int(lengths.max()) if len(lengths) else 0
    out = np.empty(n_symbols, np.int32)
    pos = 0

    def peek(pos, nb):
        v = 0
        for i in range(nb):
            w = (pos + i) >> 5
            b = (pos + i) & 31
            bit = (int(words[w]) >> b) & 1 if w < len(words) else 0
            v = (v << 1) | bit
        return v

    for i in range(n_symbols):
        v = peek(pos, LUT_DEPTH)
        s = int(lut_sym[v])
        if s >= 0:
            out[i] = s
            pos = int(pos + lut_len[v])
            continue
        # slow path: extend bit by bit
        for l in range(LUT_DEPTH + 1, maxl + 1):
            v = peek(pos, l)
            match = np.where((lengths == l) & (codes == v))[0]
            if len(match):
                out[i] = int(match[0])
                pos = int(pos + l)
                break
        else:
            raise ValueError("invalid VLC stream")
    return out
