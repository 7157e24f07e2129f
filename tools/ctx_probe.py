"""Context-model headroom probe (drives the round-3 RD-gap work).

Measures, from the encoder payload pass (no entropy coding), the empirical
conditional entropy of the three model-coded symbol streams (Z zerotree
bit, K count, S size class) under CANDIDATE context definitions, plus the
bit shares of the raw streams (pattern rank, refinement, sign). Two
numbers per scheme:

  ideal : per-image adaptive bound (sum of per-image ctx-conditional
          entropies) — what two-pass per-image tables approach
  static: corpus-fit tables evaluated per image — what the bucket-static
          path approaches

Every candidate context only uses data available to the parallel decoder
at that point of the scan schedule: coarser bands (parents), same-level
earlier orientations (stream order V, H, D), and for S/PAT phases the
whole band's k map (decoded in the ZK scan).

Usage: python tools/ctx_probe.py [quant ...]   (default 0 9 13 21)
"""
from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, SHIFT
from ric_tpu.models import image_codec
from ric_tpu.ops import blocks
from ric_tpu.utils import pnm
from ric_tpu.utils.bits import bitlen as jbitlen


def nbitlen(x):
    x = np.asarray(x)
    out = np.zeros(x.shape, np.int32)
    v = x.astype(np.int64)
    while (v > 0).any():
        out += (v > 0)
        v >>= 1
    return out


def ent_bits(ctx, sym, nsym):
    """Empirical H(sym|ctx) * n in bits (per-image adaptive bound)."""
    ctx = np.asarray(ctx).ravel()
    sym = np.asarray(sym).ravel()
    key = ctx.astype(np.int64) * nsym + sym
    cnt = np.bincount(key)
    cnt = cnt[cnt > 0].astype(np.float64)
    byctx = np.bincount(ctx.astype(np.int64), minlength=1).astype(np.float64)
    byctx = byctx[byctx > 0]
    return float(-np.sum(cnt * np.log2(cnt)) + np.sum(byctx * np.log2(byctx)))


def xent_bits(ctx, sym, nsym, fit_counts):
    """Cross-entropy of (ctx, sym) under corpus-fitted counts."""
    ctx = np.asarray(ctx).ravel().astype(np.int64)
    sym = np.asarray(sym).ravel().astype(np.int64)
    p = fit_counts + 0.5
    p = p / p.sum(axis=1, keepdims=True)
    return float(-np.sum(np.log2(p[ctx, sym])))


def payload_np(img, quant):
    h, w = img.shape
    trans = Transform.CDF53 if quant == 0 else Transform.CDF97
    cfg = CodecConfig(width=w, height=h, quant=quant, transform=trans)
    plans, _ = image_codec.make_plane_plans(cfg, False)
    if quant == 0:
        x = img.astype(np.int32) - 128
    else:
        x = (img.astype(np.int32) - 128) << SHIFT
    pay = image_codec._plane_payload(cfg, plans, jnp.asarray(x, jnp.int32))
    out = []
    for p in pay:
        d = {k: np.asarray(v) for k, v in p.items() if k != "plan"}
        d["plan"] = p["plan"]
        out.append(d)
    return out


def collect(img, quant):
    """Extract per-stream records with every candidate context feature."""
    pay = payload_np(img, quant)
    by_name = {p["plan"].name: p for p in pay}
    rec = defaultdict(list)

    for p in pay:
        plan = p["plan"]
        if plan.kind == "ll":
            continue
        lvl, orient = plan.level, plan.orient
        nlev = max(pl["plan"].level for pl in pay) + 1
        gy, gx = plan.grid

        # parent-derived block features
        ctx = p["ctx"]  # parent 2x2-coeff maxLen (current scheme)
        if lvl == nlev - 1:
            par_k = np.full(plan.grid, 17, np.int32)
            ctx3 = np.full(plan.grid, 15, np.int32)
        else:
            par = by_name[f"{orient}{lvl+1}"]
            pk = par["k"]
            par_k = np.zeros(plan.grid, np.int32)
            ky, kx = pk.shape
            # child block (by,bx) -> parent block (by//2, bx//2)
            yy = np.minimum(np.arange(gy) // 2, ky - 1)
            xx = np.minimum(np.arange(gx) // 2, kx - 1)
            par_k = pk[yy[:, None], xx[None, :]]
            # wider parent context: 3x3 parent-BLOCK maxLen pooled
            pu2 = blocks.from_blocks(
                par["u"], par["plan"].grid[0] * 4, par["plan"].grid[1] * 4)
            mag = pu2 >> 1
            bm = mag.reshape(ky, 4, kx, 4).max(axis=(1, 3))
            bm3 = np.zeros_like(bm)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sh = np.roll(np.roll(bm, dy, 0), dx, 1)
                    if dy == -1: sh[-1] = 0
                    if dy == 1: sh[0] = 0
                    if dx == -1: sh[:, -1] = 0
                    if dx == 1: sh[:, 0] = 0
                    bm3 = np.maximum(bm3, sh)
            ctx3 = np.minimum(nbitlen(bm3), 15)[yy[:, None], xx[None, :]]

        # same-level earlier-orientation (sibling) feature: block maxLen
        sibs = {"V": [], "H": ["V"], "D": ["V", "H"]}[orient]
        sib_ml = np.zeros(plan.grid, np.int32)
        for so in sibs:
            sb = by_name[f"{so}{lvl}"]
            sml = nbitlen(np.max(sb["u"] >> 1, axis=-1))
            sy = min(sml.shape[0], gy); sx = min(sml.shape[1], gx)
            cur = np.zeros(plan.grid, np.int32)
            cur[:sy, :sx] = sml[:sy, :sx]
            sib_ml = np.maximum(sib_ml, cur)
        sib_ml = np.minimum(sib_ml, 15)

        # within-band neighbor k (checkerboard availability bound)
        k2 = p["k"]
        nb_sum = np.zeros(plan.grid, np.int32)
        nb_cnt = np.zeros(plan.grid, np.int32)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sh = np.roll(np.roll(k2, dy, 0), dx, 1)
            ok = np.ones(plan.grid, bool)
            if dy == 1: sh[0] = 0; ok[0] = False
            if dy == -1: sh[-1] = 0; ok[-1] = False
            if dx == 1: sh[:, 0] = 0; ok[:, 0] = False
            if dx == -1: sh[:, -1] = 0; ok[:, -1] = False
            nb_sum += sh; nb_cnt += ok
        nb_k = nb_sum // np.maximum(nb_cnt, 1)

        lvlc = min(lvl, 2)
        oid = {"V": 0, "H": 1, "D": 2}[orient]

        # Z stream
        m = p["z_act"]
        if m.any():
            rec["z"].append(dict(
                sym=p["z"][m], ctx=ctx[m], lvl=np.full(m.sum(), lvlc),
                orient=np.full(m.sum(), oid), par_k=np.minimum(par_k, 17)[m],
                ctx3=ctx3[m], sib=sib_ml[m], nbk=nb_k[m],
                cb=((np.add.outer(np.arange(gy), np.arange(gx)) % 2))[m],
            ))
        # K stream
        m = p["sig"]
        if m.any():
            ksym = p["k"][m] - (1 if plan.kind == "high" else 0)
            rec["k"].append(dict(
                sym=ksym, ctx=ctx[m], lvl=np.full(m.sum(), lvlc),
                orient=np.full(m.sum(), oid), par_k=np.minimum(par_k, 17)[m],
                ctx3=ctx3[m], sib=sib_ml[m], nbk=nb_k[m],
                cb=((np.add.outer(np.arange(gy), np.arange(gx)) % 2))[m],
                high=np.full(m.sum(), plan.kind == "high"),
            ))
        # S stream (per coeff)
        act = p["active"]
        if act.any():
            s = p["s"]
            k_cf = np.repeat(p["k"][..., None], 16, axis=-1)
            ctx_cf = np.repeat(ctx[..., None], 16, axis=-1)
            lvl_cf = np.full(act.sum(), lvlc)
            # per-coeff parent coefficient bitlen
            if lvl == nlev - 1:
                pc = np.zeros(act.shape[:2] + (16,), np.int32)
            else:
                par = by_name[f"{orient}{lvl+1}"]
                pu2 = blocks.from_blocks(
                    par["u"], par["plan"].grid[0] * 4,
                    par["plan"].grid[1] * 4) >> 1
                H2, W2 = gy * 4, gx * 4
                yy = np.minimum(np.arange(H2) // 2, pu2.shape[0] - 1)
                xx = np.minimum(np.arange(W2) // 2, pu2.shape[1] - 1)
                pc2d = pu2[yy[:, None], xx[None, :]]
                pc = blocks_to(pc2d, gy, gx)
            cpm = ctx_cf[act]
            rec["s"].append(dict(
                sym=s[act], k=np.minimum(k_cf[act] - 1, 15),
                ctx=cpm, lvl=lvl_cf,
                ctx4=((cpm > 0) + (cpm > 2) + (cpm > 5)).astype(np.int64),
                ctx8=((cpm > 0) + (cpm > 1) + (cpm > 2) + (cpm > 3)
                      + (cpm > 5) + (cpm > 7) + (cpm > 10)).astype(np.int64),
                pc=np.minimum(nbitlen(pc[act]), 7),
            ))
            # refinement top bit (s >= 2)
            m2 = act & (s >= 2)
            if m2.any():
                refv = p["field"][m2] >> 1
                top = (refv >> (s[m2] - 2)) & 1
                rec["rtop"].append(dict(sym=top, s=np.minimum(s[m2], 15)))
    return rec


def blocks_to(x2d, gy, gx):
    h, w = x2d.shape
    x = x2d.reshape(gy, 4, gx, 4).swapaxes(1, 2).reshape(gy, gx, 16)
    return x


def merge(recs, field):
    return np.concatenate([r[field] for r in recs])


def scheme_eval(images_recs, stream, feats, nsym, name):
    """feats: list of (field, nvals) composed into a product context."""
    total_ideal = 0.0
    nctx = 1
    for _, nv in feats:
        nctx *= nv
    # corpus fit
    fit = np.zeros((nctx, nsym), np.float64)
    percim = []
    per_fit = []
    for recs in images_recs:
        rs = recs.get(stream, [])
        if not rs:
            percim.append((0, 0.0)); per_fit.append(None); continue
        ctx = np.zeros(len(merge(rs, "sym")), np.int64)
        for f, nv in feats:
            v = np.clip(merge(rs, f).astype(np.int64), 0, nv - 1)
            ctx = ctx * nv + v
        sym = merge(rs, "sym").astype(np.int64)
        h = np.zeros((nctx, nsym), np.float64)
        np.add.at(h, (ctx, sym), 1.0)
        fit += h
        per_fit.append(h)
        percim.append((ctx, sym))
    total_section = 0.0
    for (ctx, sym), h in zip(percim, per_fit):
        if isinstance(ctx, int):
            continue
        total_ideal += ent_bits(ctx, sym, nsym)
        # rough per-image table section cost: ~5 bits per nonzero entry of
        # a 12-bit-normalized table (delta-coded vs static)
        total_section += 5.0 * float((h > 0).sum())
    total_static = 0.0
    total_loo = 0.0
    for (ctx, sym), h in zip(percim, per_fit):
        if isinstance(ctx, int):
            continue
        total_static += xent_bits(ctx, sym, nsym, fit)
        total_loo += xent_bits(ctx, sym, nsym, fit - h)
    n = fit.sum()
    return dict(name=name, nctx=nctx, n=int(n), ideal=total_ideal,
                static=total_static, loo=total_loo, section=total_section)


def split_eval(images_recs, stream, nsym, featsA, featsB, nbq, name):
    """Causal checkerboard split: cb=0 symbols under featsA (no neighbor
    info), cb=1 symbols under featsB + quantized nbk (all 4 neighbors are
    cb=0, so the parallel decoder has them after pass A). nbq = list of
    thresholds defining the nbk quantization."""
    def q_nbk(v):
        out = np.zeros_like(v)
        for t in nbq:
            out += (v > t)
        return out

    tot = {}
    for half, feats in (("A", featsA), ("B", featsB)):
        nctx = 1
        for _, nv in feats:
            nctx *= nv
        if half == "B":
            nctx *= len(nbq) + 1
        fit = np.zeros((nctx, nsym), np.float64)
        per = []
        for recs in images_recs:
            rs = recs.get(stream, [])
            if not rs:
                per.append(None); continue
            cb = merge(rs, "cb").astype(np.int64)
            m = cb == (0 if half == "A" else 1)
            ctx = np.zeros(int(m.sum()), np.int64)
            for f, nv in feats:
                v = np.clip(merge(rs, f)[m].astype(np.int64), 0, nv - 1)
                ctx = ctx * nv + v
            if half == "B":
                ctx = ctx * (len(nbq) + 1) + q_nbk(
                    merge(rs, "nbk")[m].astype(np.int64))
            sym = merge(rs, "sym")[m].astype(np.int64)
            h = np.zeros((nctx, nsym), np.float64)
            np.add.at(h, (ctx, sym), 1.0)
            fit += h
            per.append((ctx, sym, h))
        ideal = static = loo = 0.0
        for p in per:
            if p is None:
                continue
            ctx, sym, h = p
            ideal += ent_bits(ctx, sym, nsym)
            static += xent_bits(ctx, sym, nsym, fit)
            loo += xent_bits(ctx, sym, nsym, fit - h)
        tot[half] = (ideal, static, loo)
    ideal = tot["A"][0] + tot["B"][0]
    static = tot["A"][1] + tot["B"][1]
    loo = tot["A"][2] + tot["B"][2]
    print(f"  {name:24s} SPLIT "
          f"ideal={ideal/8/1024:8.1f} static={static/8/1024:8.1f} "
          f"loo={loo/8/1024:8.1f} KiB", flush=True)


def main():
    quants = [int(a) for a in sys.argv[1:]] or [0, 9, 13, 21]
    import glob
    paths = sorted(glob.glob("corpus/c512_*.pgm"))
    imgs = [(p.split("/")[-1][:-4], pnm.read_pnm(p)) for p in paths]
    print(f"{len(imgs)} images; quants {quants}", flush=True)

    for q in quants:
        images_recs = []
        for name, img in imgs:
            images_recs.append(collect(img, q))
            print(f"  collected {name} q{q}", flush=True)
        npx = sum(im.size for _, im in imgs)

        print(f"\n=== quant {q} ({npx/1e6:.1f} Mpix total) ===", flush=True)
        # raw-stream shares for orientation
        for stream, nsym, schemes in [
            ("z", 2, [
                ("cur: parML", [("ctx", 16)]),
                ("parML x lvl", [("ctx", 16), ("lvl", 3)]),
                ("parML x orient", [("ctx", 16), ("orient", 3)]),
                ("parML x lvl x orient", [("ctx", 16), ("lvl", 3), ("orient", 3)]),
                ("parML x sibML", [("ctx", 16), ("sib", 16)]),
                ("parML x par_k", [("ctx", 16), ("par_k", 18)]),
                ("parML3x3 x lvl", [("ctx3", 16), ("lvl", 3)]),
                ("parML x sib x lvl", [("ctx", 16), ("sib", 16), ("lvl", 3)]),
                ("parML x nbk(bound)", [("ctx", 16), ("nbk", 17)]),
            ]),
            ("k", 17, [
                ("cur: parML", [("ctx", 16)]),
                ("parML x lvl", [("ctx", 16), ("lvl", 3)]),
                ("parML x orient", [("ctx", 16), ("orient", 3)]),
                ("parML x lvl x orient", [("ctx", 16), ("lvl", 3), ("orient", 3)]),
                ("parML x sibML", [("ctx", 16), ("sib", 16)]),
                ("parML x par_k", [("ctx", 16), ("par_k", 18)]),
                ("parML x sib x lvl", [("ctx", 16), ("sib", 16), ("lvl", 3)]),
                ("parML x nbk(bound)", [("ctx", 16), ("nbk", 17)]),
            ]),
            ("s", 32, [
                ("cur: k-1", [("k", 16)]),
                ("k x lvl", [("k", 16), ("lvl", 3)]),
                ("k x parML", [("k", 16), ("ctx", 16)]),
                ("k x pcoefbl", [("k", 16), ("pc", 8)]),
                ("k x pml4 x lvl", [("k", 16), ("ctx4", 4), ("lvl", 3)]),
                ("k x pml8 x lvl", [("k", 16), ("ctx8", 8), ("lvl", 3)]),
                ("k x parML x lvl", [("k", 16), ("ctx", 16), ("lvl", 3)]),
                ("k x pc x lvl", [("k", 16), ("pc", 8), ("lvl", 3)]),
                ("k x pml8 x pc x lvl", [("k", 16), ("ctx8", 8),
                                         ("pc", 8), ("lvl", 3)]),
            ]),
            ("rtop", 2, [
                ("raw 1bit", []),
                ("by s", [("s", 16)]),
            ]),
        ]:
            print(f" stream {stream}:")
            for name, feats in schemes:
                r = scheme_eval(images_recs, stream, feats, nsym, name)
                print(f"  {name:24s} nctx={r['nctx']:4d} "
                      f"ideal={r['ideal']/8/1024:8.1f} "
                      f"+sec={(r['ideal']+r['section'])/8/1024:8.1f} "
                      f"static={r['static']/8/1024:8.1f} "
                      f"loo={r['loo']/8/1024:8.1f} KiB "
                      f"({r['n']} syms)", flush=True)
            if stream in ("z", "k"):
                base = [("ctx", 16), ("lvl", 3), ("orient", 3)]
                for nbq, nm in (((0, 2, 6), "nbk4"), ((0, 1, 3, 6, 10), "nbk6"),
                                ((0, 1, 2, 4, 6, 9, 12), "nbk8")):
                    split_eval(images_recs, stream, nsym, base, base, nbq,
                               f"cb-split {nm}")


if __name__ == "__main__":
    main()
