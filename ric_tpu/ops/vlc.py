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


# --------------------------------------------------------------------------
# Device VLC: L interleaved lanes, LUT-stepping decode — the TPU-native
# redesign of the reference's serial LUT decoder (huffcodec.cpp:332-362,
# muxcodec.h:242-276). Symbol j lives on lane j % L at step j // L; each
# lane keeps a 32-bit MSB-aligned bit buffer, decodes one code per step
# from an 8-bit first-stage LUT (one-hot MXU fetch, no gathers) with a
# canonical-range second stage for codes longer than 8 bits, and refills
# 16-bit words from ONE shared raster-order stream — the same
# consumption-order word scheduling the rANS engine uses (the encoder
# compacts its emission grid with rans.compact_words; the decoder pulls
# from a cursor window with rans.expand_words).
#
# Wire: [2L x u16 initial buffer halves (lane-major, MSB half first)]
#       [16-bit refill words, raster consumption order].
# --------------------------------------------------------------------------


def _device_tables(lengths, codes, max_len: int = 15):
    """First-stage LUT (256 entries: len<=8 codes resolved directly;
    longer codes marked) + canonical second-stage arrays."""
    lengths = np.asarray(lengths, np.int32)
    codes = np.asarray(codes, np.uint32)
    lut = np.zeros(256, np.int32)  # sym | len << 16 ; -1 len => long code
    for s, (l, c) in enumerate(zip(lengths, codes)):
        if l == 0 or l > 8:
            continue
        base = int(c) << (8 - l)
        lut[base : base + (1 << (8 - l))] = s | (l << 16)
    # long codes: canonical => for each length l in (8, max_len], symbols
    # sorted by code; value (code << (max_len - l)) ranges are disjoint
    # and ordered, so a per-length (first_value, first_index) pair turns
    # the next max_len bits into an index by compare-count.
    longs = [(int(codes[s]) << (max_len - int(lengths[s])), s,
              int(lengths[s]))
             for s in range(len(lengths)) if lengths[s] > 8]
    longs.sort()
    lvals = np.asarray([v for v, _, _ in longs], np.int64)
    lsyms = np.asarray([s for _, s, _ in longs], np.int32)
    llens = np.asarray([l for _, _, l in longs], np.int32)
    return lut, lvals, lsyms, llens


def encode_lanes(symbols, lengths, codes, L: int, cap16: int):
    """Encode n symbols over L interleaved lanes.

    Returns (init (2L,) u16 lane-buffer halves, stream16 (cap16,) u16,
    n_words). Pure numpy orchestration of per-lane bitstreams + the
    rANS-style consumption-order interleave; encode is offline/per-table
    (sections, tools), decode is the device hot path."""
    import jax.numpy as jnp  # noqa: F811 (device compaction reuse)
    from ric_tpu.ops import rans

    symbols = np.asarray(symbols, np.int32)
    lengths = np.asarray(lengths, np.int32)
    codes = np.asarray(codes, np.uint32)
    n = len(symbols)
    T = -(-n // L)
    syms_g = np.full((T, L), -1, np.int32)
    syms_g.reshape(-1)[:n] = symbols
    # per-lane bit strings, MSB-first
    lane_bits = [[] for _ in range(L)]
    for t in range(T):
        for l in range(L):
            s = syms_g[t, l]
            if s < 0:
                continue
            c, ln = int(codes[s]), int(lengths[s])
            lane_bits[l].extend(((c >> (ln - 1 - b)) & 1)
                                for b in range(ln))
    # per-lane 16-bit words (MSB-first within word), zero-padded
    lane_words = []
    for l in range(L):
        bits = lane_bits[l]
        bits = bits + [0] * ((-len(bits)) % 16)
        ws = [
            int("".join(map(str, bits[i : i + 16])), 2) if bits else 0
            for i in range(0, len(bits), 16)
        ]
        lane_words.append(ws + [0, 0])  # slack for init fill
    init = np.zeros(2 * L, np.uint16)
    for l in range(L):
        init[2 * l] = lane_words[l][0]       # MSB half
        init[2 * l + 1] = lane_words[l][1]
    # simulate decode to get the refill schedule: per step, lanes whose
    # buffer drops to <= 16 valid bits pull their next word, lane order
    nbits = np.full(L, 32, np.int64)
    nextw = np.full(L, 2, np.int64)
    emit = np.zeros((T, L), bool)
    words = np.zeros((T, L), np.uint32)
    for t in range(T):
        for l in range(L):
            s = syms_g[t, l]
            if s < 0:
                continue
            nbits[l] -= int(lengths[s])
            if nbits[l] <= 16:
                emit[t, l] = True
                j = int(nextw[l])
                words[t, l] = lane_words[l][j] if j < len(lane_words[l]) \
                    else 0
                nextw[l] += 1
                nbits[l] += 16
    stream, nw = rans.compact_words(
        jnp.asarray(emit), jnp.asarray(words), cap16)
    return init, np.asarray(stream), int(nw)


def decode_lanes(init, stream16, n_symbols: int, lengths, codes, L: int):
    """Device decode of encode_lanes' wire format. init (2L,) u16/u32;
    stream16 (N,) u32 of 16-bit words (>= L zero slack past payload).
    Returns (n_symbols,) int32 symbols. jit-able; no per-element gathers
    (LUT via one-hot MXU fetch, refill via rans.expand_words)."""
    import jax
    import jax.numpy as jnp
    from ric_tpu.ops import rans

    max_len = int(np.max(np.asarray(lengths))) if len(lengths) else 1
    max_len = max(max_len, 1)
    lut, lvals, lsyms, llens = _device_tables(lengths, codes, max_len)
    lut_f = jnp.asarray(lut, jnp.float32)           # (256,) sym|len<<16
    nlong = len(lvals)
    T = -(-n_symbols // L)
    act_g = (jnp.arange(T * L).reshape(T, L) < n_symbols)

    init = jnp.asarray(init, jnp.uint32)
    buf0 = (init[0::2] << 16) | init[1::2]          # (L,) MSB-aligned
    cols = jnp.arange(256, dtype=jnp.int32)

    if nlong:
        lv = jnp.asarray(lvals, jnp.float32)        # sorted first-values
        ls = jnp.asarray(lsyms, jnp.float32)
        ll = jnp.asarray(llens, jnp.float32)
        lcols = jnp.arange(nlong, dtype=jnp.int32)

    def step(carry, act_r):
        buf, nbits, gpos = carry
        idx = (buf >> 24).astype(jnp.int32)
        oh = (idx[:, None] == cols[None, :]).astype(jnp.float32)
        ent = jnp.dot(oh, lut_f,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
        sym = ent & 0xFFFF
        ln = ent >> 16
        if nlong:
            # canonical long-code second stage: compare-count over the
            # sorted first-values of the (code << (max_len - len)) space
            v = (buf >> (32 - max_len)).astype(jnp.float32)
            cnt = jnp.sum(v[:, None] >= lv[None, :], axis=1) - 1
            cnt = jnp.clip(cnt, 0, nlong - 1).astype(jnp.int32)
            ohl = (cnt[:, None] == lcols[None, :]).astype(jnp.float32)
            lsym = jnp.dot(ohl, ls,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            llen = jnp.dot(ohl, ll,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            is_long = ln == 0
            sym = jnp.where(is_long, lsym, sym)
            ln = jnp.where(is_long, llen, ln)
        ln = jnp.where(act_r, ln, 0)
        buf = jnp.where(act_r, buf << ln.astype(jnp.uint32), buf)
        nbits = nbits - ln
        need = act_r & (nbits <= 16)
        win = jax.lax.dynamic_slice(stream16, (gpos,), (L,))
        w = rans.expand_words(win, need).astype(jnp.uint32)
        sh = jnp.clip(16 - nbits, 0, 31).astype(jnp.uint32)
        buf = jnp.where(need, buf | (w << sh), buf)
        nbits = jnp.where(need, nbits + 16, nbits)
        gpos = gpos + jnp.sum(need.astype(jnp.int32))
        return (buf, nbits, gpos), jnp.where(act_r, sym, 0)

    (buff, nbf, gp), syms = jax.lax.scan(
        step, (buf0, jnp.full((L,), 32, jnp.int32), jnp.int32(0)), act_g)
    return syms.reshape(-1)[:n_symbols]


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
