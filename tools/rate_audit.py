"""Per-image rate attribution vs the reference (round-4 north-star work).

For each corpus image x quant, splits OUR container bytes into
  header+CRCs | lane-state flush (4B x L) | table section A | rANS payload
and compares against the reference oracle's bytes on the same plane, so
the fixed-cost share of the rate gap is measured, not guessed.

Usage: python tools/rate_audit.py [quant ...]   (default 0 9 13 21)
"""
from __future__ import annotations

import glob
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
from ric_tpu.config import CodecConfig, Transform, SHIFT, quant_step
from ric_tpu.models import image_codec as ic
from ric_tpu.utils import pnm
from ric_tpu.utils.container import read_container
from oracle import oracle


def ref_bytes(img, quant):
    plane = img.astype(np.int16) - 128
    if quant == 0:
        q = lam = 0
        trans = 1
    else:
        plane = (plane.astype(np.int32) << SHIFT).astype(np.int16)
        q = quant_step(quant + SHIFT * 5)
        lam = quant_step(quant + SHIFT * 5 - 7)
        trans = 0
    stream = oracle.encode(plane, 5, 1, trans, q, lam)
    return len(stream) + 9  # reference container header is 9 bytes


def main():
    quants = [int(a) for a in sys.argv[1:]] or [0, 9, 13, 21]
    paths = sorted(glob.glob("corpus/c512_*.pgm"))
    for q in quants:
        tot_ours = tot_ref = tot_flush = tot_sec = tot_head = 0
        print(f"=== quant {q} ===")
        print(f"{'image':14s} {'ours':>7s} {'ref':>7s} {'ratio':>6s} "
              f"{'head':>5s} {'flush':>5s} {'secA':>5s} {'payl':>7s} "
              f"{'fixed%':>6s}")
        for p in paths:
            name = p.split("/")[-1][:-4]
            img = pnm.read_pnm(p)
            h, w = img.shape
            cfg = CodecConfig(
                width=w, height=h, quant=q,
                transform=Transform.CDF53 if q == 0 else Transform.CDF97)
            data = ic.encode_image(img, cfg, check=False)
            cfgr, streams, _, _, _, _ = read_container(data)
            L = ic._lanes(cfgr)
            lenA, lenB = len(streams[0]), len(streams[1])
            head = len(data) - lenA - lenB - ((-lenA) % 4)
            flush = 4 * L
            payload = lenB - flush
            rb = ref_bytes(img, q)
            fixed = head + flush + lenA
            print(f"{name:14s} {len(data):7d} {rb:7d} {len(data)/rb:6.3f} "
                  f"{head:5d} {flush:5d} {lenA:5d} {payload:7d} "
                  f"{100*fixed/len(data):6.1f}")
            tot_ours += len(data); tot_ref += rb
            tot_flush += flush; tot_sec += lenA; tot_head += head
        print(f"{'TOTAL':14s} {tot_ours:7d} {tot_ref:7d} "
              f"{tot_ours/tot_ref:6.3f} {tot_head:5d} {tot_flush:5d} "
              f"{tot_sec:5d}   gap={tot_ours-tot_ref:+d} B "
              f"(flush+sec+head = {tot_head+tot_flush+tot_sec} B)")
        print(flush=True)


if __name__ == "__main__":
    main()
