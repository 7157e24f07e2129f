"""Per-section bit breakdown of our format vs the reference stream size.

Shows where the bpp gap lives: rANS model bits (cross-entropy under the
fitted tables, split by Z/KL/KH/S group), raw pattern bits, raw
refinement+sign bits, and lane-state overhead.

Usage: python tools/breakdown.py [WxH] [quant]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from oracle import oracle
from ric_tpu.config import CodecConfig, Transform, SHIFT, quant_step
from ric_tpu.models import image_codec, tables as tbl
from parity import synthetic


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "512x512"
    w, h = map(int, size.split("x"))
    quant = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    trans = 1 if quant == 0 else 0
    img = synthetic(h, w)
    cfg = CodecConfig(width=w, height=h, quant=quant,
                      transform=Transform(trans), levels=5)
    fn = image_codec.build_plane_stats(cfg, False)
    x = (img.astype(np.int32) - 128) << (0 if quant == 0 else SHIFT)
    hist, rawbits, diag = fn(jnp.asarray(x, jnp.int32))
    hist = np.asarray(hist, np.float64)
    freqs = tbl.coarse_np(tbl.rate_bucket(quant)).astype(np.float64)
    p = freqs / 4096.0
    with np.errstate(divide="ignore"):
        bits_tbl = np.where(hist > 0, hist * -np.log2(np.maximum(p, 1e-12)), 0)
    npx = w * h
    groups = {"Z": tbl.Z_BASE, "KL": tbl.KL_BASE, "KH": tbl.KH_BASE,
              "S": tbl.S_BASE}
    total = 0.0
    for name, base in groups.items():
        b = bits_tbl[base : base + 16].sum()
        # entropy bound with per-image optimal static tables
        hh = hist[base : base + 16]
        ph = hh / np.maximum(hh.sum(axis=1, keepdims=True), 1)
        ent = np.where(hh > 0, hh * -np.log2(np.maximum(ph, 1e-12)), 0).sum()
        nsym = hh.sum()
        print(f"{name:3s}: {b/npx:7.4f} bpp  (ideal-static {ent/npx:7.4f}, "
              f"{nsym:9.0f} syms)")
        total += b
    pat = int(diag["pattern_bits"])
    ref_b = int(diag["refine_bits"])
    L = image_codec._lanes(cfg)
    states = L * 32
    print(f"pat: {pat/npx:7.4f} bpp")
    print(f"ref: {ref_b/npx:7.4f} bpp (refinement+sign)")
    print(f"sts: {states/npx:7.4f} bpp ({L} lanes)")
    total += pat + ref_b + states
    print(f"TOTAL est: {total/npx:.4f} bpp")

    # reference actual
    plane = x.astype(np.int16)
    q = quant_step(quant + SHIFT * 5) if quant else 0
    lam = quant_step(quant + SHIFT * 5 - 7) if quant else 0
    stream = oracle.encode(plane, 5, 1, trans, q, lam)
    print(f"reference: {len(stream)*8/npx:.4f} bpp")


if __name__ == "__main__":
    main()
