"""Interleaved-lane range Asymmetric Numeral System coder (static tables).

This is the TPU-native replacement for the reference's serial adaptive
entropy stack (CMuxCodec range coder + CBitCodec + CGeomCodec + adaptive
k_mean Huffman selection, SURVEY.md §2 #5-8). Those coders are bit-serial
with data-dependent state; here, L independent rANS lanes advance in
lockstep — symbol j of a section lives on lane j % L at step j // L — so
encode and decode vectorize across lanes on the VPU while staying
*deterministic*: stream bytes depend only on the input and the static
tables, never on timing or mesh shape.

Scheme (standard rANS, Duda/Giesen construction):
  * probability scale M = 2^12 (matches the reference's FREQ_POWER)
  * 32-bit lane state x in [2^16, 2^32), 16-bit renormalization
  * encode (reverse symbol order):
      if x >= freq << 20: emit low 16 bits, x >>= 16
      x = (x // freq) << 12 | (x % freq + start)
  * decode (forward): slot = x & 4095; s = slot2sym[slot]
      x = freq[s] * (x >> 12) + slot - start[s]
      if x < 2^16: x = x << 16 | next word
  Single-renorm-per-step is guaranteed by M <= renorm base; table freqs are
  capped at M-1 so `freq << 20` never overflows uint32.

Word order: the word emitted while encoding symbol (t, lane) is exactly the
word read after decoding symbol (t, lane), and decode consumes in (t, lane)
raster order — so the encoder just compacts its emission grid in raster
order; no stream reversal is needed.

Masked lanes (section tails, insignificant blocks) leave lane state
untouched on both sides, so sections of *dynamic* symbol count run under
static shapes.

Context modeling: every symbol carries a table id; tables are gathered per
(lane, step), giving the reference's context-conditioned coding without its
serial adaptation.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

RANS_L = 1 << 16
M_BITS = 12
M = 1 << M_BITS


def build_tables(freqs: np.ndarray):
    """freqs: (n_tables, alphabet) ints, each row sums to M, zeros allowed
    for impossible symbols, nonzero entries capped at M-1.

    Returns dict of device arrays: freq (T,A) u32, start (T,A) u32,
    slot2sym (T,M) i32.
    """
    freqs = np.asarray(freqs, np.int64)
    assert (freqs.sum(axis=1) == M).all(), "each table must sum to 4096"
    assert (freqs < M).all(), "cap freqs at 4095"
    starts = np.cumsum(freqs, axis=1) - freqs
    ntab, alpha = freqs.shape
    slot2sym = np.zeros((ntab, M), np.int32)
    for t in range(ntab):
        for s in range(alpha):
            slot2sym[t, starts[t, s] : starts[t, s] + freqs[t, s]] = s
    # fused decode LUT: one gather per decoded symbol
    # layout: sym(5b) | freq(12b)<<5 | start(12b)<<17
    t_idx = np.arange(freqs.shape[0])[:, None]
    slot_lut = (
        slot2sym.astype(np.int64)
        | (freqs[t_idx, slot2sym].astype(np.int64) << 5)
        | (starts[t_idx, slot2sym].astype(np.int64) << 17)
    ).astype(np.uint32)
    return {
        "freq": jnp.asarray(freqs, jnp.uint32),
        "start": jnp.asarray(starts, jnp.uint32),
        "slot2sym": jnp.asarray(slot2sym, jnp.int32),
        "slot_lut": jnp.asarray(slot_lut),
    }


# ==========================================================================
# v2 engine: raster-word-order duplex-phase coder (gather-free decode).
#
# Measured on the target TPU (tools/perf_probe*.py): XLA gathers/scatters
# serialize at ~10 ns/element in every context, while dense vector ops,
# one-hot MXU matmuls, contiguous dynamic slices and rolls run at full
# throughput. The v2 decoder therefore contains NO gathers:
#   * symbol lookup: per-lane cumulative-frequency rows are fetched with a
#     one-hot matmul against the (64, 32) table and the symbol is a
#     compare-count (replaces the reference's serial range-decoder search,
#     muxcodec.h:190-223, and v1's 4096-entry slot LUT gather);
#   * renormalization words are stored in GLOBAL RASTER order (the order
#     the decoder consumes them); each step takes a contiguous L-word
#     window at a scalar cursor and distributes words to needing lanes by
#     a binary-decomposition "pull" (exact for monotone 0/1-increment
#     lags — see expand_words) — the TPU-native replacement for the
#     reference's serial byte FIFO (muxcodec.cpp:536-579).
#   * raw bit fields ride the same stream as uniform-table slots whose
#     (freq, start) are pure arithmetic — the CMuxCodec range⊕raw mux
#     (SURVEY §2 #5) reborn without a second substream.
# ==========================================================================

UNIFORM_BASE = 64  # tid >= UNIFORM_BASE + w  => raw w-bit uniform slot


def _limbs(x, n):
    """Split non-negative int32 (T, A) into n 8-bit limbs as bf16 tables.

    bf16 holds integers < 256 exactly, and a one-hot row picks exactly ONE
    table entry per output, so a DEFAULT-precision bf16 MXU matmul
    (f32 accumulate) reconstructs each limb without any rounding — at full
    MXU rate instead of Precision.HIGHEST's multi-pass emulation. (The
    round-1 advisory about bf16 rounding applied to >8-bit table values
    fed to the MXU directly; limbs stay below that bound by construction.)
    """
    return [
        ((x >> (8 * i)) & 0xFF).astype(jnp.bfloat16) for i in range(n)
    ]


def _onehot_fetch(ohot_bf16, limbs):
    """sum_i 256^i * (ohot @ limb_i), each product exact. Returns f32."""
    out = None
    for i, lm in enumerate(limbs):
        part = jnp.dot(ohot_bf16, lm, preferred_element_type=jnp.float32)
        out = part if out is None else out + part * jnp.float32(1 << (8 * i))
    return out


def enc_dec_tables(freq):
    """freq: (n_tables, 32) int rows summing to M. Returns dense rows for
    the gather-free scan: cum (inclusive cumulative freqs, 13 bits -> two
    8-bit bf16 limbs) and comb (freq + start * M < 2^24 -> three limbs)."""
    freq = jnp.asarray(freq, jnp.int32)
    cum = jnp.cumsum(freq, axis=1)
    start = cum - freq
    comb = freq + start * M
    return {
        "cum": cum.astype(jnp.float32),
        "comb": comb.astype(jnp.float32),
        "cum_l": _limbs(cum, 2),
        "comb_l": _limbs(comb, 3),
        "freq_i": freq,
        "start_i": start,
    }


def slice_tables(tables, base: int, n: int):
    """Static row slice of the dense enc/dec tables (free XLA slices).
    Scans pass per-band slices so the one-hot fetch width stays at the
    band's context-row count (16 or 256) no matter how many fine-context
    tables exist globally."""
    out = {}
    for k in ("cum", "comb", "freq_i", "start_i"):
        if k in tables:
            out[k] = tables[k][base : base + n]
    for k in ("cum_l", "comb_l"):
        if k in tables:
            out[k] = [lm[base : base + n] for lm in tables[k]]
    return out


def modulate_tables(fine_freq, img_coarse, stat_coarse, coarse_of,
                    valid_fine):
    """Per-image ratio modulation of the fine static tables (deterministic
    integer math — encoder and decoder derive identical tables).

    fine_freq (NF, A) int32 static fine tables (rows sum M);
    img_coarse (NC, A) int32 per-image two-pass coarse tables (rows sum M);
    stat_coarse (NC, A) int32 static coarse projection (rows sum M);
    coarse_of (NF,) int32 fine->coarse row map; valid_fine (NF, A) bool.

    C(f,s) = fine(f,s) * img(c(f),s) // max(stat(c(f),s), 1) keeps the
    fine-context structure from the corpus fit while applying the image's
    coarse-level frequency shifts (the parallel answer to the reference's
    in-band adaptation). Products stay < 2^24 (both factors < 2^12).
    """
    qi = img_coarse[coarse_of]
    qs = jnp.maximum(stat_coarse[coarse_of], 1)
    c = (fine_freq * qi) // qs
    c = jnp.where(valid_fine, jnp.maximum(c, 1), 0)
    return device_normalize(c, valid_fine)


def model_rows(tables, tid):
    """One-hot matmul row fetch: tid (L,) int32 -> (cum_rows, comb_rows)
    each (L, 32) f32, bit-exact.

    Wide grids use the bf16 limb fetch (full MXU rate); narrow grids are
    latency-bound, where one HIGHEST-precision matmul beats several small
    limb matmuls."""
    ntab = tables["cum"].shape[0]
    cols = jnp.arange(ntab, dtype=jnp.int32)
    if tid.shape[0] >= 8192:
        ohot = (tid[:, None] == cols[None, :]).astype(jnp.bfloat16)
        cum = _onehot_fetch(ohot, tables["cum_l"])
        comb = _onehot_fetch(ohot, tables["comb_l"])
        return cum, comb
    ohot = (tid[:, None] == cols[None, :]).astype(jnp.float32)
    cum = jnp.dot(ohot, tables["cum"], precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    comb = jnp.dot(ohot, tables["comb"], precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return cum, comb


def model_transition(tables, x, tid, act):
    """Decode one model-table symbol per lane. Returns (sym, xn) where xn
    is the pre-renormalization state; inactive lanes keep x."""
    slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
    cum_rows, comb_rows = model_rows(tables, tid)
    sym = jnp.sum(slot.astype(jnp.float32)[:, None] >= cum_rows,
                  axis=1).astype(jnp.int32)
    a32 = jnp.arange(32, dtype=jnp.int32)
    ohs = (sym[:, None] == a32[None, :]).astype(jnp.float32)
    both = jnp.sum(comb_rows * ohs, axis=1).astype(jnp.int32)
    f = jnp.where(act, (both & (M - 1)).astype(jnp.uint32), jnp.uint32(1))
    st = jnp.where(act, (both >> M_BITS).astype(jnp.uint32), jnp.uint32(0))
    xn = f * (x >> M_BITS) + slot.astype(jnp.uint32) - st
    return jnp.where(act, sym, 0), jnp.where(act, xn, x)


def uniform_transition(x, width, act):
    """Decode a raw `width`-bit value per lane (width (L,) int32 in
    [0, 12]); freq = M >> width, start = v << (12 - width) — no tables."""
    act = act & (width > 0)
    slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
    sh = (M_BITS - jnp.clip(width, 0, M_BITS)).astype(jnp.uint32)
    v = (slot >> sh).astype(jnp.int32)
    f = (jnp.uint32(1) << sh)
    st = v.astype(jnp.uint32) << sh
    xn = f * (x >> M_BITS) + slot.astype(jnp.uint32) - st
    return jnp.where(act, v, 0), jnp.where(act, xn, x)


def expand_words(win, need):
    """w[l] = win[p_l] with p = exclusive cumsum of need — gather-free.

    The lag s_l = (number of non-needing lanes before l) is monotone with
    0/1 increments, so pulling from distance 2^b for each set bit of s
    (high to low) is exact: after the stages above bit b, the applied
    shift at any two lanes within 2^b of each other is identical (both
    equal the high bits of s), so every pull grabs the right element."""
    L = need.shape[0]
    non = 1 - need.astype(jnp.int32)
    s = jnp.cumsum(non) - non
    cur = win
    b = max(L - 1, 1).bit_length() - 1
    for bb in range(b, -1, -1):
        d = 1 << bb
        if d >= L:
            continue
        shifted = jnp.concatenate([cur[-d:], cur[:-d]])
        cur = jnp.where((s >> bb) & 1 == 1, shifted, cur)
    return cur


def renorm(xn, act, stream, gpos):
    """Read renormalization words for lanes whose state dropped below
    RANS_L. stream: (N,) u32 of 16-bit words (raster order), padded by at
    least L zeros past the payload. Returns (x, gpos')."""
    L = xn.shape[0]
    need = act & (xn < RANS_L)
    win = jax.lax.dynamic_slice(stream, (gpos,), (L,))
    w = expand_words(win, need)
    x = jnp.where(need, (xn << 16) | w, xn)
    return x, gpos + jnp.sum(need.astype(jnp.int32))


# --------------------------- encoder side ---------------------------------


def enc_pack_model(tables, sym, tid, act):
    """(freq, start) for model slots, packed as act | f<<1 | start<<13.
    Narrow one-hot over the table id keeps this off the gather path."""
    ntab = tables["cum"].shape[0]
    cols = jnp.arange(ntab, dtype=jnp.int32)
    ohot = (tid[:, None] == cols[None, :]).astype(jnp.bfloat16)
    comb_rows = _onehot_fetch(ohot, tables["comb_l"])
    a32 = jnp.arange(32, dtype=jnp.int32)
    ohs = (jnp.clip(sym, 0, 31)[:, None] == a32[None, :]).astype(jnp.float32)
    both = jnp.sum(comb_rows * ohs, axis=1).astype(jnp.int32)
    f = (both & (M - 1)).astype(jnp.uint32)
    st = (both >> M_BITS).astype(jnp.uint32)
    return jnp.where(
        act,
        jnp.uint32(1) | (f << 1) | (st << 13),
        jnp.uint32(0),
    )


def enc_pack_uniform(val, width, act):
    """Packed (freq, start) for raw `width`-bit slots."""
    act = act & (width > 0)
    sh = (M_BITS - jnp.clip(width, 0, M_BITS)).astype(jnp.uint32)
    f = jnp.uint32(1) << sh
    st = val.astype(jnp.uint32) << sh
    return jnp.where(act, jnp.uint32(1) | (f << 1) | (st << 13),
                     jnp.uint32(0))


def _divmod_by_freq(x1, f):
    """Exact (x1 // f, x1 % f) for u32 lanes with x1 < f << 20, f in [1, 4096].

    TPU has no native integer divide — XLA emulates `u32 //` with a long
    instruction sequence, and this runs once per encoded slot (the scan-step
    hot path). The active-slot quotient fits 20 bits (the emit test caps
    x1 < f << 20, and post-emit states are < 2^16), so a float32 estimate
    is within +-1 of the true quotient and two integer corrections pin it
    exactly. Lanes violating the precondition (inactive lanes carry f=1
    with an arbitrary 32-bit state) get a clamped, possibly wrong quotient;
    every caller discards those lanes via `where(act, ...)`.
    """
    q = jnp.floor(x1.astype(jnp.float32) / f.astype(jnp.float32))
    q = jnp.minimum(q, jnp.float32((1 << 20) + 2)).astype(jnp.uint32)
    r = (x1 - q * f).astype(jnp.int32)
    fi = f.astype(jnp.int32)
    under = r < 0
    q = q - under.astype(jnp.uint32)
    r = jnp.where(under, r + fi, r)
    over = r >= fi
    q = q + over.astype(jnp.uint32)
    r = jnp.where(over, r - fi, r)
    return q, r.astype(jnp.uint32)


def encode_packed(packed):
    """Reverse-order encode over a (T, L) packed (act|f|start) grid.

    Returns (states (L,) u32, emit (T, L) bool, words (T, L) u32): the
    word emitted while encoding slot (t, l) is exactly the word the
    decoder reads after decoding slot (t, l), and the decoder consumes
    words in (t, lane) raster order — so compaction is a raster-order
    prefix-sum scatter, and decoding is a contiguous cursor walk."""
    T, L = packed.shape
    if T == 0:
        return (
            jnp.full((L,), RANS_L, jnp.uint32),
            jnp.zeros((0, L), bool),
            jnp.zeros((0, L), jnp.uint32),
        )

    def step(x, pk):
        act = (pk & 1) == 1
        f = jnp.where(act, (pk >> 1) & jnp.uint32(0xFFF), 1)
        st = (pk >> 13)
        emit = act & (x >= (f << 20))
        word = x & jnp.uint32(0xFFFF)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = _divmod_by_freq(x1, f)
        xn = (q << M_BITS) + r + st
        return jnp.where(act, xn, x), (emit, word)

    x0 = jnp.full((L,), RANS_L, jnp.uint32) + (packed[0] * 0)
    xf, (emit_r, words_r) = jax.lax.scan(
        step, x0, jnp.flip(packed, axis=0))
    return xf, jnp.flip(emit_r, 0), jnp.flip(words_r, 0)


def encode_packed_sparse(packed, chunk: int = 8, reorder: bool = True,
                         return_nact: bool = False):
    """encode_packed skipping all-inactive rows — byte-identical output.

    reorder=False returns the emission grids in PARTITIONED row order
    (active rows first) without the two full-grid inverse takes. Because
    the partition is stable and inactive rows emit nothing, raster-order
    word compaction over the partitioned grids yields exactly the same
    word sequence — callers that only feed compact_words should pass
    False (saves ~2 full-grid permutations per plane).

    A row of the packed grid with no active slot is an identity step of the
    reverse-order scan, so it can be skipped without changing any lane
    state or emission. Sparse streams (high quantizers kill most blocks,
    and section caps are worst-case static shapes) leave only a few percent
    of rows active — e.g. ~2% at q=20 — so the scan shrinks proportionally:
    stable-partition the active rows to the front (row-level take, not a
    per-element gather), run a dynamically-bounded while-loop over `chunk`
    rows at a time, and scatter the emission rows back to their original
    positions. Dense grids pay two extra row permutations and win back the
    per-step loop overhead via chunking.
    """
    T, L = packed.shape
    assert not (return_nact and reorder), (
        "the active-prefix row count is only meaningful in partitioned "
        "(reorder=False) order")
    if T == 0:
        base = encode_packed(packed)
        return (*base, jnp.int32(0)) if return_nact else base
    act_row = jnp.any((packed & 1) == 1, axis=1)
    order = jnp.argsort(jnp.where(act_row, 0, 1), stable=True)
    rows_c = jnp.take(packed, order.astype(jnp.int32), axis=0)
    K = jnp.sum(act_row.astype(jnp.int32))
    n_iter = (K + chunk - 1) // chunk
    rows_p = jnp.concatenate(
        [rows_c, jnp.zeros((chunk, L), jnp.uint32)], axis=0)

    def step(x, pk):
        act = (pk & 1) == 1
        f = jnp.where(act, (pk >> 1) & jnp.uint32(0xFFF), 1)
        st = (pk >> 13)
        emit = act & (x >= (f << 20))
        word = jnp.where(emit, x & jnp.uint32(0xFFFF), 0)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = _divmod_by_freq(x1, f)
        xn = (q << M_BITS) + r + st
        return jnp.where(act, xn, x), emit, word

    def body(i, carry):
        x, emit_b, words_b = carry
        start = (n_iter - 1 - i) * chunk
        blk = jax.lax.dynamic_slice(rows_p, (start, 0), (chunk, L))
        ems, wds = [], []
        for j in range(chunk - 1, -1, -1):
            x, em, wd = step(x, blk[j])
            ems.append(em)
            wds.append(wd)
        em_blk = jnp.stack(ems[::-1], axis=0)
        wd_blk = jnp.stack(wds[::-1], axis=0)
        emit_b = jax.lax.dynamic_update_slice(emit_b, em_blk, (start, 0))
        words_b = jax.lax.dynamic_update_slice(words_b, wd_blk, (start, 0))
        return x, emit_b, words_b

    # anchor the loop carries to data-dependent values so their sharding
    # "varying" type matches the body outputs under shard_map
    x0 = jnp.full((L,), RANS_L, jnp.uint32) + (packed[0] * 0)
    emit0 = jnp.zeros((T + chunk, L), bool) ^ ((packed[0] & 1) == 2)
    words0 = jnp.zeros((T + chunk, L), jnp.uint32) + (packed[0] * 0)
    xf, emit_c, words_c = jax.lax.fori_loop(
        0, n_iter, body, (x0, emit0, words0))
    if not reorder:
        if return_nact:
            # K = active-row count: with the stable partition, every row
            # that can emit sits in the first K rows — the contract
            # compact_words_prefix runs on
            return xf, emit_c[:T], words_c[:T], K
        return xf, emit_c[:T], words_c[:T]
    inv = jnp.argsort(order, stable=True).astype(jnp.int32)
    emit = jnp.take(emit_c[:T], inv, axis=0)
    words = jnp.take(words_c[:T], inv, axis=0)
    return xf, emit, words


def scan_rows_sparse(body, carry, inputs, row_act, chunk: int = 8):
    """`lax.scan(body, carry, inputs)` that skips rows where row_act is
    False — for bodies where an all-inactive row is an identity step with
    all-zero outputs (the masked-lane convention of every coder scan here:
    transitions keep x, renorm consumes no words, symbol outputs are
    `where(act, ..., 0)`).

    Rows are stable-partitioned (row-level take, no per-element gather) so
    the active ones sit at the front, a fori_loop with a data-dependent
    trip count walks them `chunk` at a time, and outputs are scattered back
    to their original rows (skipped rows stay zero). High quantizers leave
    only a few percent of section rows active, so the decode scans shrink
    proportionally; dense grids win back per-step loop overhead from the
    chunking."""
    leaves = jax.tree_util.tree_leaves(inputs)
    T = leaves[0].shape[0]
    if T == 0:
        return jax.lax.scan(body, carry, inputs)
    tmap = jax.tree_util.tree_map
    order = jnp.argsort(
        jnp.where(row_act, 0, 1), stable=True).astype(jnp.int32)
    inv = jnp.argsort(order, stable=True).astype(jnp.int32)
    ins_p = tmap(
        lambda a: jnp.concatenate(
            [jnp.take(a, order, axis=0),
             jnp.zeros((chunk,) + a.shape[1:], a.dtype)], axis=0),
        inputs)
    K = jnp.sum(row_act.astype(jnp.int32))
    n_iter = (K + chunk - 1) // chunk

    row0 = tmap(lambda a: a[0], inputs)
    out_sd = jax.eval_shape(lambda c, r: body(c, r)[1], carry, row0)
    # anchor the zero-initialized output buffers to a data-dependent scalar
    # so their sharding "varying" type matches the body outputs under
    # shard_map (same trick as the scan carries elsewhere in this module)
    r0 = leaves[0].ravel()[0] * 0

    def _zero(s):
        z = jnp.zeros((T + chunk,) + s.shape, s.dtype)
        if s.dtype == jnp.dtype(bool):
            return z ^ r0.astype(bool)
        return z + r0.astype(s.dtype)

    outs0 = tmap(_zero, out_sd)

    def loop_body(i, state):
        carry, outs = state
        start = i * chunk
        blk = tmap(
            lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk, 0),
            ins_p)
        rows_out = []
        for j in range(chunk):
            carry, o = body(carry, tmap(lambda a: a[j], blk))
            rows_out.append(o)
        out_blk = tmap(lambda *xs: jnp.stack(xs, 0), *rows_out)
        outs = tmap(
            lambda b, ob: jax.lax.dynamic_update_slice_in_dim(
                b, ob, start, 0),
            outs, out_blk)
        return carry, outs

    carry, outs = jax.lax.fori_loop(0, n_iter, loop_body, (carry, outs0))
    outs = tmap(lambda a: jnp.take(a[:T], inv, axis=0), outs)
    return carry, outs


def compact_words(emit, words, cap: int):
    """Raster-order compaction of emitted 16-bit words into a (cap,) u16
    array, one word per entry — whose row-major BYTES are exactly the
    stream-B wire layout, so no u16->u32 pairing ever happens on device
    (any element-order-preserving width change is a cross-lane
    de-interleave on TPU, measured ~30 ms at 40M words).
    Returns (stream_u16, n_words).

    A flat per-element scatter costs ~8 ns/element on TPU (serialized);
    this instead compacts in three dense stages:
      1. within 128-slot segments, compact emitted words to the front via
         LSB-first staged conditional rolls by the displacement base-4
         digits (order-preserving compaction with nondecreasing leftward
         displacements never collides), state packed into one u32/slot —
         4 traffic-bound passes instead of the O(SEG) one-hot reduce that
         dominated r2 encode at 104 ms;
      2. align each segment's run to its global offset B_s = exclusive
         cumsum of segment counts with 4 radix-4 staged conditional rolls
         (base-4 decomposition of B_s mod 128), in uint16 — half traffic;
      3. place each segment's two aligned 128-wide halves with a windowed
         u16 row scatter-add at block indices B_s//128 (+1) — XLA executes
         windowed scatters per-INDEX, and distinct segments' nonzero
         spans are globally disjoint so overlapping zero lanes add 0;
    The output stream is byte-identical to the flat scatter's.
    """
    e = emit.ravel()
    w = jnp.where(e, words.ravel(), 0)
    n = e.shape[0]
    SEG = 128
    if n % SEG and n >= SEG:
        # pad with non-emitting tail slots: raster compaction ignores them,
        # so the staged path stays available for any (T, L) shape (small
        # lane counts rarely land on a multiple of SEG)
        pad = SEG - n % SEG
        e = jnp.concatenate([e, jnp.zeros((pad,), e.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
        n += pad
    if n < SEG:
        pos = jnp.cumsum(e.astype(jnp.int32)) - e.astype(jnp.int32)
        stream = jnp.zeros((cap,), jnp.uint16)
        stream = stream.at[jnp.where(e, pos, cap)].set(
            w.astype(jnp.uint16), mode="drop")
        return stream, jnp.sum(e.astype(jnp.int32))

    S = n // SEG
    e2 = e.reshape(S, SEG).astype(jnp.int32)
    w2 = w.reshape(S, SEG)
    k = jnp.sum(e2, axis=1)                       # (S,) words per segment
    base = jnp.cumsum(k) - k                      # (S,) global offsets
    # 1: intra-segment compaction via staged rolls, LSB-first, radix 4.
    # Each emitted slot must move left by delta = position - rank; moving
    # by its delta base-4 digits never collides (deltas are nondecreasing
    # along a segment, so a mover's landing slot is either empty or vacated
    # in the same stage). State is one packed u32 per slot
    # (word<<9 | delta<<1 | ok) so each pass moves a single array — the
    # whole stage is 4 dense traffic-bound (S, SEG) passes.
    rank = jnp.cumsum(e2, axis=1) - e2
    j = jnp.arange(SEG, dtype=jnp.int32)
    delta0 = jnp.where(e2 == 1, j[None, :] - rank, 0).astype(jnp.uint32)
    st = (w2 << 9) | (delta0 << 1) | e2.astype(jnp.uint32)

    def shl(a, d):
        return jnp.concatenate(
            [a[:, d:], jnp.zeros((S, d), a.dtype)], axis=1)

    for kbit in range(0, 7, 2):
        dig = jnp.where((st & 1) == 1, (st >> (1 + kbit)) & 3, 0)
        moved = jnp.where(dig == 0, st, 0)
        for m in (1, 2, 3):
            if (m << kbit) >= SEG:
                break
            sh = shl(st, m << kbit)
            dig_s = jnp.where((sh & 1) == 1, (sh >> (1 + kbit)) & 3, 0)
            inc = jnp.where(dig_s == m, sh - ((m << kbit) << 1), 0)
            moved = moved | inc
        st = moved
    wc = (st >> 9).astype(jnp.uint16)  # (S, SEG): words at front, 0 after
    # 2: align to base % SEG with staged rolls over a double-width row
    # (radix 4: 4 traffic-bound passes instead of 7; u16 halves traffic)
    phi = (base % SEG).astype(jnp.int32)
    ext = jnp.concatenate([wc, jnp.zeros((S, SEG), jnp.uint16)], axis=1)
    for b in range(0, 7, 2):
        dig = ((phi >> b) & 3)[:, None]
        nxt = jnp.where(dig == 0, ext, 0)
        for m in (1, 2, 3):
            d = m << b
            if d >= 2 * SEG:
                break
            rolled = jnp.concatenate([ext[:, -d:], ext[:, :-d]], axis=1)
            nxt = nxt | jnp.where(dig == m, rolled, 0)
        ext = nxt
    # 3: windowed scatter-add of both halves at block granularity
    nblk = cap // SEG + 2
    blk = (base // SEG).astype(jnp.int32)
    out = jnp.zeros((nblk, SEG), jnp.uint16)
    out = out.at[blk].add(ext[:, :SEG], mode="drop")
    out = out.at[blk + 1].add(ext[:, SEG:], mode="drop")
    return out.reshape(-1)[:cap], jnp.sum(e.astype(jnp.int32))


def compact_words_prefix(emit, words, cap: int, n_rows,
                         chunk_seg: int = 256):
    """compact_words for PARTITIONED emission grids (the reorder=False
    output of encode_packed_sparse): every emitting slot lives in the
    first `n_rows` rows, so the staged-roll and placement stages run in a
    dynamic-trip-count loop over just the emitting prefix's 128-slot
    segments — the R/D-killed worst-case grid is touched only by the
    cheap per-segment count reduce and the packed-state build (one dense
    elementwise pass). Byte-identical to compact_words on such grids.

    At 4096^2 q20 (T=20624, L=2048, ~2% active rows) the dense
    compact_words costs 47 ms on chip — 36 ms of staged rolls over the
    330k-segment worst-case grid plus an 11 ms per-index scatter — while
    the prefix walks ~27 chunks (VERDICT r5 #4: encoder-side sparse grid
    build). Placement uses an exact one-hot f32 matmul per chunk (words
    < 2^16 and spans are disjoint, so f32 accumulation is integer-exact)
    into a read-modify-write output window instead of any scatter."""
    e = emit.ravel()
    n = e.shape[0]
    L = emit.shape[1] if emit.ndim == 2 else 1
    SEG = 128
    if n < SEG or n % SEG:
        # small or ragged grids: the dense path is already cheap
        return compact_words(emit, words, cap)
    S = n // SEG
    CS = min(chunk_seg, S)
    e2 = e.reshape(S, SEG)
    w2 = words.ravel().reshape(S, SEG)
    # the ONLY dense pass over the worst-case grid: per-segment emission
    # counts (reads the bool grid once; the words grid is never read
    # outside the prefix chunks below)
    k = jnp.sum(e2.astype(jnp.int32), axis=1)
    base = jnp.cumsum(k) - k
    # segments wholly past the emitting prefix never contribute
    n_seg = jnp.minimum((n_rows * L + SEG - 1) // SEG, S)
    n_iter = (n_seg + CS - 1) // CS
    j = jnp.arange(SEG, dtype=jnp.int32)
    jc = jnp.arange(CS, dtype=jnp.int32)
    nblk = cap // SEG + 2
    # output padded by a chunk's max block span so the RMW window of the
    # final chunk stays in range (dynamic_slice clamping would otherwise
    # silently shift the window); u16 keeps the loop-carried buffer (and
    # its zero-init/final passes) at half the f32 traffic
    out0 = jnp.zeros((nblk + CS + 2, SEG), jnp.uint16)
    rblk = jnp.arange(CS + 2, dtype=jnp.int32)

    def body(i, out):
        # clamp the last chunk's window instead of padding (padding would
        # copy the full worst-case words grid); segments re-covered by the
        # clamp were handled by the previous chunk, so mask them dead —
        # their ext rows become zero and add nothing to the RMW window
        # (which still spans <= CS+2 blocks: blk_local is measured from
        # the window's own first segment)
        start_req = i * CS
        start = jnp.minimum(start_req, S - CS)
        fresh = (jc >= start_req - start)[:, None]
        ec = (jax.lax.dynamic_slice(e2, (start, 0), (CS, SEG))
              & fresh).astype(jnp.int32)
        wcr = jax.lax.dynamic_slice(w2, (start, 0), (CS, SEG))
        basec = jax.lax.dynamic_slice(base, (start,), (CS,))
        rank = jnp.cumsum(ec, axis=1) - ec
        delta0 = jnp.where(ec == 1, j[None, :] - rank, 0).astype(jnp.uint32)
        stc = ((jnp.where(ec == 1, wcr, 0) << 9) | (delta0 << 1)
               | ec.astype(jnp.uint32))

        def shl(a, d):
            return jnp.concatenate(
                [a[:, d:], jnp.zeros((CS, d), a.dtype)], axis=1)

        for kbit in range(0, 7, 2):
            dig = jnp.where((stc & 1) == 1, (stc >> (1 + kbit)) & 3, 0)
            moved = jnp.where(dig == 0, stc, 0)
            for m in (1, 2, 3):
                if (m << kbit) >= SEG:
                    break
                sh = shl(stc, m << kbit)
                dig_s = jnp.where((sh & 1) == 1, (sh >> (1 + kbit)) & 3, 0)
                inc = jnp.where(dig_s == m, sh - ((m << kbit) << 1), 0)
                moved = moved | inc
            stc = moved
        wc = (stc >> 9).astype(jnp.uint16)
        phi = (basec % SEG).astype(jnp.int32)
        ext = jnp.concatenate([wc, jnp.zeros((CS, SEG), jnp.uint16)], axis=1)
        for b in range(0, 7, 2):
            dig = ((phi >> b) & 3)[:, None]
            nxt = jnp.where(dig == 0, ext, 0)
            for m in (1, 2, 3):
                d = m << b
                if d >= 2 * SEG:
                    break
                rolled = jnp.concatenate(
                    [ext[:, -d:], ext[:, :-d]], axis=1)
                nxt = nxt | jnp.where(dig == m, rolled, 0)
            ext = nxt
        blk0 = basec[0] // SEG
        blk_local = (basec // SEG).astype(jnp.int32) - blk0
        # one-hot placement: chunk segments span <= CS+2 output blocks
        # (sum k <= CS*SEG). f32 matmul is exact: one word per position.
        oh_lo = (blk_local[None, :] == rblk[:, None]).astype(jnp.float32)
        oh_hi = (blk_local[None, :] == (rblk - 1)[:, None]).astype(
            jnp.float32)
        contrib = (oh_lo @ ext[:, :SEG].astype(jnp.float32)
                   + oh_hi @ ext[:, SEG:].astype(jnp.float32)
                   ).astype(jnp.uint16)
        win = jax.lax.dynamic_slice(out, (blk0, 0), (CS + 2, SEG))
        return jax.lax.dynamic_update_slice(out, win + contrib, (blk0, 0))

    out = jax.lax.fori_loop(0, n_iter, body, out0)
    stream = out[:nblk].reshape(-1)[:cap]
    return stream, jnp.sum(k)


def compact_by_mask(vals, mask, cap: int):
    """Order-preserving compaction: out[rank(i)] = vals[i] for mask[i],
    zeros past the active count. Returns ((cap,) vals.dtype, K int32).

    Same staged-roll scheme as compact_words (validated in simulation and
    by byte-equality there) carrying (value, delta<<1|ok) pairs, so values
    keep their full 32-bit width. This is the slot-grid packer of the
    sparse "packed scan" mode: both codec sides derive identical masks, so
    the dense grid layout is part of the format at sparse quantizers."""
    n = vals.shape[0]
    SEG = 128
    pad = (-n) % SEG
    if pad:
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    S = vals.shape[0] // SEG
    e2 = mask.reshape(S, SEG).astype(jnp.uint32)
    v2 = jnp.where(e2 == 1, vals.reshape(S, SEG), 0)
    k = jnp.sum(e2.astype(jnp.int32), axis=1)
    base = jnp.cumsum(k) - k
    rank = jnp.cumsum(e2, axis=1) - e2
    j = jnp.arange(SEG, dtype=jnp.uint32)
    delta = jnp.where(e2 == 1, j[None, :] - rank, 0)
    ctl = (delta << 1) | e2

    def shl(a, d):
        return jnp.concatenate(
            [a[:, d:], jnp.zeros((S, d), a.dtype)], axis=1)

    for kbit in range(0, 7, 2):
        dig = jnp.where((ctl & 1) == 1, (ctl >> (1 + kbit)) & 3, 0)
        keep = dig == 0
        nv = jnp.where(keep, v2, 0)
        nc = jnp.where(keep, ctl, 0)
        for m in (1, 2, 3):
            d = m << kbit
            if d >= SEG:
                break
            sv, sc = shl(v2, d), shl(ctl, d)
            dig_s = jnp.where((sc & 1) == 1, (sc >> (1 + kbit)) & 3, 0)
            pick = dig_s == m
            nv = nv | jnp.where(pick, sv, 0)
            nc = nc | jnp.where(pick, sc - jnp.uint32(d << 1), 0)
        v2, ctl = nv, nc
    # stage 2: align each segment run to base % SEG over a 2*SEG row
    phi = (base % SEG).astype(jnp.int32)
    ext = jnp.concatenate([v2, jnp.zeros((S, SEG), v2.dtype)], axis=1)
    for b in range(0, 7, 2):
        dig = ((phi >> b) & 3)[:, None]
        nxt = jnp.where(dig == 0, ext, 0)
        for m in (1, 2, 3):
            d = m << b
            if d >= 2 * SEG:
                break
            rolled = jnp.concatenate([ext[:, -d:], ext[:, :-d]], axis=1)
            nxt = nxt | jnp.where(dig == m, rolled, 0)
        ext = nxt
    nblk = cap // SEG + 2
    blk = (base // SEG).astype(jnp.int32)
    out = jnp.zeros((nblk, SEG), vals.dtype)
    out = out.at[blk].add(ext[:, :SEG], mode="drop")
    out = out.at[blk + 1].add(ext[:, SEG:], mode="drop")
    return out.reshape(-1)[:cap], jnp.sum(k)


def expand_by_mask(dense, mask, L: int):
    """Inverse of compact_by_mask: out[i] = dense[rank(i)] where mask[i],
    0 elsewhere. dense: (T*L,) flat packed values with T = ceil(n/L).

    Row t of the output draws ranks [rs_t, rs_t + L) which live inside two
    consecutive dense rows starting at rs_t // L — a row-level (monotone)
    take builds a (T, 2L) window, and a binary lag-decomposition pull
    places each value (the expand_words argument generalized to a 2L
    window; validated in simulation over random masks)."""
    n = mask.shape[0]
    T = -(-n // L)
    m = mask
    if T * L > n:
        m = jnp.concatenate([m, jnp.zeros((T * L - n,), bool)])
    mi = m.astype(jnp.int32)
    rank = jnp.cumsum(mi) - mi
    rank2 = rank.reshape(T, L)
    rs = rank2[:, 0]
    blk = rs // L
    d2 = jnp.concatenate([dense, jnp.zeros((2 * L,), dense.dtype)])
    d2r = d2.reshape(-1, L)
    rows_a = jnp.take(d2r, blk, axis=0)
    rows_b = jnp.take(d2r, blk + 1, axis=0)
    win = jnp.concatenate([rows_a, rows_b], axis=1)  # (T, 2L)
    off = rank2 - (blk * L)[:, None]
    jj = jnp.arange(L, dtype=jnp.int32)
    lag = (jj[None, :] + L) - off
    s = jnp.concatenate(
        [jnp.repeat(lag[:, :1], L, axis=1), lag], axis=1)
    cur = win
    W = 2 * L
    nb = (W - 1).bit_length() - 1
    for bb in range(nb, -1, -1):
        d = 1 << bb
        if d >= W:
            continue
        shifted = jnp.concatenate([cur[:, -d:], cur[:, :-d]], axis=1)
        cur = jnp.where(((s >> bb) & 1) == 1, shifted, cur)
    out = jnp.where(m.reshape(T, L), cur[:, L:], 0)
    return out.reshape(-1)[:n]


def unpack_words16(stream_u16):
    """compact_words' u16 stream -> the decoder-side one-word-per-u32
    stream16 convention (hosts do this while parsing the container, tests
    use it directly)."""
    return stream_u16.astype(jnp.uint32)


def _table_lookup_f32(idx, table_f32):
    """Lookup 25M-scale indices in a small table via chunked one-hot
    matmuls on the MXU (~7x faster than XLA's serialized gather on TPU).
    Table values must be < 2^24 (exact in f32)."""
    n = idx.shape[0]
    chunk = 8192
    pad = (-n) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    width = table_f32.shape[0]
    cols = jnp.arange(width, dtype=jnp.int32)

    def one(ix):
        oh = (ix[:, None] == cols[None, :]).astype(jnp.float32)
        # exactness-critical: values up to 2^24-1 must survive the MXU
        # accumulation untouched, so force full f32 precision (the TPU
        # default would round inputs to bf16)
        return jnp.dot(
            oh, table_f32,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    out = jax.lax.map(one, idx.reshape(-1, chunk)).reshape(-1)
    return out[:n]


def encode(tables, symbols, tids, active):
    """Encode a (T, L) symbol grid in global reverse order.

    symbols/tids: (T, L) int32; active: (T, L) bool.
    Returns (final_states (L,) u32, emit (T, L) bool, words (T, L) u32).

    The (freq, start) lookups happen once for the whole grid before the
    scan — symbols are known upfront on the encode side — so the scan body
    is pure arithmetic. freq and start are fused into one f32 table value
    (freq + start*4096 < 2^24, exact) looked up by one-hot matmul.
    """
    freq, start = tables["freq"], tables["start"]
    L = symbols.shape[1]
    alpha = freq.shape[1]
    comb = (
        freq.astype(jnp.int32) + start.astype(jnp.int32) * M
    ).astype(jnp.float32).ravel()
    idx = (tids * alpha + jnp.clip(symbols, 0, alpha - 1)).ravel()
    both = _table_lookup_f32(idx, comb).astype(jnp.int32).reshape(tids.shape)
    f_all = jnp.where(active, (both % M).astype(jnp.uint32), 1)
    st_all = jnp.where(active, (both // M).astype(jnp.uint32), 0)

    def step(x, inp):
        f, st, act = inp
        emit = act & (x >= (f << 20))
        word = x & jnp.uint32(0xFFFF)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = _divmod_by_freq(x1, f)
        xn = (q << M_BITS) + r + st
        return jnp.where(act, xn, x), (emit, word)

    if symbols.shape[0] == 0:
        return (
            jnp.full((L,), RANS_L, jnp.uint32),
            jnp.zeros((0, L), bool),
            jnp.zeros((0, L), jnp.uint32),
        )
    # derive the initial carry from data-dependent inputs so its sharding
    # "varying" type matches the scan outputs under shard_map
    x0 = jnp.full((L,), RANS_L, jnp.uint32) + (f_all[0] * 0)
    rev = lambda a: jnp.flip(a, axis=0)
    xf, (emit_r, words_r) = jax.lax.scan(
        step, x0, (rev(f_all), rev(st_all), rev(active))
    )
    return xf, jnp.flip(emit_r, 0), jnp.flip(words_r, 0)


def decode_section(tables, states, stream16, lane_pos, tids, active):
    """Decode a (T, L) section grid in forward order.

    states: (L,) u32 lane states; stream16: (N,) u32 array of 16-bit words
    in LANE-MAJOR order; lane_pos: (L,) i32 absolute index of each lane's
    next unread word (initialized from the per-lane word counts stored in
    the stream); tids/active: (T, L).
    Returns (symbols (T, L) i32, new_states, new_lane_pos).

    The lane-major layout makes the renorm read per step a pure per-lane
    gather + counter increment — no cross-lane prefix sum in the scan
    (a per-step 32k-lane cumsum dominated decode time).
    """
    slot_lut = tables["slot_lut"]
    if stream16.shape[0] == 0:
        stream16 = jnp.zeros((1,), jnp.uint32)
    n = stream16.shape[0]

    def step(carry, inp):
        x, pos = carry
        tid, act = inp
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        entry = slot_lut[tid, slot]  # one fused gather per symbol
        sym = (entry & jnp.uint32(31)).astype(jnp.int32)
        f = jnp.where(act, (entry >> 5) & jnp.uint32(0xFFF), 1)
        st = jnp.where(act, entry >> 17, 0)
        xn = f * (x >> M_BITS) + slot.astype(jnp.uint32) - st
        need = act & (xn < RANS_L)
        w = stream16[jnp.clip(pos, 0, n - 1)]
        xn = jnp.where(need, (xn << 16) | w, xn)
        x = jnp.where(act, xn, x)
        pos = pos + need.astype(jnp.int32)
        return (x, pos), jnp.where(act, sym, 0)

    if tids.shape[0] == 0:
        return jnp.zeros((0,) + tids.shape[1:], jnp.int32), states, lane_pos
    # tie carries to guaranteed-varying inputs (shard_map varying typing)
    anchor = (states[0] * 0).astype(jnp.int32)
    lane_pos = lane_pos + anchor
    tids = tids + anchor
    active = active & (anchor == 0)
    (xf, pf), syms = jax.lax.scan(step, (states, lane_pos), (tids, active))
    return syms, xf, pf


# --------------------------------------------------------------------------
# Grid layout helpers: section of n_max slots -> (ceil(n_max/L), L) grids
# --------------------------------------------------------------------------


def to_grid(flat, L, fill=0):
    """(n,) -> (ceil(n/L), L), padding with `fill`."""
    n = flat.shape[0]
    T = -(-n // L)
    pad = T * L - n
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), fill, flat.dtype)], axis=0
        )
    return flat.reshape(T, L)


def from_grid(grid, n):
    return grid.reshape(-1)[:n]


def device_normalize(hist, valid):
    """Deterministic on-device histogram -> M-sum frequency tables.

    hist: (T, A) int32 symbol counts; valid: (T, A) bool static mask.
    Occurring symbols get freq >= 1; rows sum to exactly M; entries capped
    at M-1. Both encoder and decoder derive identical tables from the same
    ints, so per-image tables need no reference implementation on the host.
    """
    valid = jnp.asarray(valid)
    # every VALID symbol keeps freq >= 1 even at count 0: under the
    # per-band evolution a symbol may first appear in a later band, and a
    # zero frequency would make it uncodable (division by zero in the
    # encoder transition)
    c = jnp.where(valid, jnp.maximum(hist, 1), 0).astype(jnp.int32)
    pos = c > 0
    total = jnp.sum(c, axis=1, keepdims=True)
    # rescale so c*M fits in int32
    sh = jnp.maximum(0, (32 - jax.lax.clz(jnp.maximum(total, 1))) - 18)
    c2 = jnp.maximum(c >> sh, pos.astype(jnp.int32))
    tot2 = jnp.maximum(jnp.sum(c2, axis=1, keepdims=True), 1)
    f = jnp.where(pos, jnp.maximum(1, (c2 * M) // tot2), 0)
    f = jnp.minimum(f, M - 1)

    def fix(i, f):
        diff = M - jnp.sum(f, axis=1, keepdims=True)
        room_up = jnp.where(valid, (M - 1) - f, 0)
        room_dn = jnp.where(f > 0, f - 1, 0)
        ju = jnp.argmax(room_up, axis=1, keepdims=True)
        jd = jnp.argmax(room_dn, axis=1, keepdims=True)
        upd_up = jnp.minimum(diff, jnp.take_along_axis(room_up, ju, 1))
        upd_dn = jnp.minimum(-diff, jnp.take_along_axis(room_dn, jd, 1))
        f = jnp.where(
            diff > 0,
            f.at[jnp.arange(f.shape[0])[:, None], ju].add(
                jnp.maximum(upd_up, 0)
            ),
            f.at[jnp.arange(f.shape[0])[:, None], jd].add(
                -jnp.maximum(upd_dn, 0)
            ),
        )
        return f

    f = jax.lax.fori_loop(0, 8, fix, f)
    return f


def device_build_tables(freq):
    """(T, A) int32 freqs (rows sum to M) -> tables dict with the decode
    LUT built on device (vmapped searchsorted)."""
    freq = freq.astype(jnp.uint32)
    start = jnp.cumsum(freq, axis=1) - freq
    cum = jnp.cumsum(freq, axis=1).astype(jnp.int32)
    slots = jnp.arange(M, dtype=jnp.int32)
    slot2sym = jax.vmap(
        lambda c: jnp.searchsorted(c, slots, side="right")
    )(cum).astype(jnp.int32)
    t_idx = jnp.arange(freq.shape[0])[:, None]
    slot_lut = (
        slot2sym.astype(jnp.uint32)
        | (freq[t_idx, slot2sym] << 5)
        | (start[t_idx, slot2sym] << 17)
    )
    return {"freq": freq, "start": start, "slot2sym": slot2sym,
            "slot_lut": slot_lut}


def normalize_freqs(counts: np.ndarray, alphabet_valid=None) -> np.ndarray:
    """Turn raw histogram rows into M-sum tables (min freq 1 on valid
    symbols, capped at M-1). counts: (n_tables, A) float/int."""
    counts = np.asarray(counts, np.float64)
    out = np.zeros_like(counts, dtype=np.int64)
    for t in range(counts.shape[0]):
        c = counts[t].copy()
        valid = (
            alphabet_valid[t]
            if alphabet_valid is not None
            else np.ones_like(c, bool)
        )
        c = np.where(valid, np.maximum(c, 1e-3), 0.0)
        total = c.sum()
        if total == 0:
            c = valid.astype(np.float64)
            total = c.sum()
        f = np.floor(c / total * M).astype(np.int64)
        f = np.where(valid & (f == 0), 1, f)
        f = np.minimum(f, M - 1)
        # fix the sum by adjusting the largest entries
        diff = M - f.sum()
        order = np.argsort(-f)
        i = 0
        while diff != 0:
            j = order[i % len(order)]
            if valid[j]:
                stepv = 1 if diff > 0 else -1
                if 1 <= f[j] + stepv <= M - 1:
                    f[j] += stepv
                    diff -= stepv
            i += 1
        out[t] = f
    return out
