"""RD sweep vs the reference (BASELINE.json config #3: corpus rate sweep).

For each image and target bpp in {0.25, 0.5, 1.0, 2.0}, finds the quantizer
whose bpp is closest for BOTH codecs, then compares PSNR at (nearly)
matched rate — the north-star lossy acceptance criterion.

Usage: python tools/rd_sweep.py [image.pgm ...]
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
from oracle import oracle
from ric_tpu.config import CodecConfig, Transform, SHIFT, quant_step
from ric_tpu.models import image_codec
from ric_tpu.utils import pnm
from ric_tpu.utils.metrics import psnr

TARGETS = (0.25, 0.5, 1.0, 2.0)


def ours_point(img, q):
    h, w = img.shape
    cfg = CodecConfig(width=w, height=h, quant=q, transform=Transform.CDF97)
    # check=False: envelope-matched comparison (the reference's 9 B
    # header ships no integrity; ref_point adds those 9 B symmetrically)
    d = image_codec.encode_image(img, cfg, check=False)
    out = image_codec.decode_image(d)
    return len(d) * 8 / (w * h), psnr(out, img.astype(np.int32))

def ref_point(img, q):
    h, w = img.shape
    plane = ((img.astype(np.int16) - 128) << SHIFT).astype(np.int16)
    qs = quant_step(q + SHIFT * 5)
    lam = quant_step(q + SHIFT * 5 - 7)
    stream = oracle.encode(plane, 5, 1, 0, qs, lam)
    rec = oracle.decode(stream, w, h, 5, 1, 0, qs)
    out = np.clip(128 + ((rec.astype(np.int32) + (1 << (SHIFT - 1))) >> SHIFT), 0, 255)
    return (len(stream) + 9) * 8 / (w * h), psnr(out, img.astype(np.int32))


def _interp(points, target_bpp):
    """PSNR at exact target bpp by linear interpolation of the RD curve."""
    pts = sorted(points)  # by bpp ascending
    for (b0, p0), (b1, p1) in zip(pts, pts[1:]):
        if b0 <= target_bpp <= b1:
            t = (target_bpp - b0) / max(b1 - b0, 1e-9)
            return p0 + t * (p1 - p0)
    return None


QS = list(range(1, 28, 2))


def sweep(img, name):
    qs = QS
    ours = [ours_point(img, q) for q in qs]
    ref = [ref_point(img, q) for q in qs]
    print(f"== {name}", flush=True)
    for q, (bo, po), (br, pr) in zip(qs, ours, ref):
        print(f"  q{q:2d}: ours {bo:.3f} bpp {po:5.2f} dB | "
              f"ref {br:.3f} bpp {pr:5.2f} dB | rate x{bo/br:.3f}",
              flush=True)
    deltas = {}
    for target in TARGETS:
        po = _interp(ours, target)
        pr = _interp(ref, target)
        if po is None or pr is None:
            continue
        deltas[target] = po - pr
        print(
            f"  {target:4.2f} bpp | ours {po:6.2f} dB | ref {pr:6.2f} dB "
            f"| delta {po - pr:+5.2f} dB", flush=True
        )
    return deltas


def main():
    global QS
    args = sys.argv[1:]
    if args and args[0].startswith("--quants="):
        QS = [int(v) for v in args[0].split("=")[1].split(",")]
        args = args[1:]
    paths = args or sorted(glob.glob("corpus/*.pgm"))
    all_d = {}
    for p in paths:
        img = pnm.read_pnm(p)
        if img.ndim == 3:
            continue
        all_d[p] = sweep(img, p)
    # summary table (PARITY.md corpus sweep)
    print("\n== summary: matched-rate PSNR delta (ours - ref, dB)")
    hdr = "image".ljust(24) + "".join(f"{t:>9.2f}" for t in TARGETS)
    print(hdr + "  (bpp targets)")
    sums = {t: [] for t in TARGETS}
    for p, d in all_d.items():
        row = p.split("/")[-1].ljust(24)
        for t in TARGETS:
            if t in d:
                row += f"{d[t]:+9.2f}"
                sums[t].append(d[t])
            else:
                row += "        -"
        print(row)
    row = "MEAN".ljust(24)
    for t in TARGETS:
        row += (f"{np.mean(sums[t]):+9.2f}" if sums[t] else "        -")
    print(row, flush=True)


if __name__ == "__main__":
    main()
