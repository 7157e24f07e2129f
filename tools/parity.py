"""Compression parity evaluation: our codec vs the compiled reference.

Prints bpp (lossless) and PSNR-at-bpp (lossy) for both codecs on the
synthetic content class used by BASELINE.md (gradient + noise), plus any
PGM files passed as arguments.

Usage: python tools/parity.py [WxH] [quants...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "tools")
sys.path.insert(0, ".")

from oracle import oracle
from ric_tpu.config import CodecConfig, Transform, SHIFT, quant_step
from ric_tpu.models import image_codec
from ric_tpu.utils.metrics import psnr


def synthetic(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        96
        + 80 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
        + 24 * np.sin((xx + yy) / 11.0)
        + rng.normal(0, 4, size=(h, w))
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def eval_config(img, quant, trans):
    h, w = img.shape
    cfg = CodecConfig(width=w, height=h, quant=quant,
                      transform=Transform(trans), levels=5)
    # ours
    t0 = time.time()
    data = image_codec.encode_image(img, cfg)
    out = image_codec.decode_image(data)
    dt = time.time() - t0
    ours_bpp = len(data) * 8 / (w * h)
    ours_psnr = psnr(out, img.astype(np.int32))
    ours_exact = np.array_equal(out, img.astype(np.int32))

    # reference: replicate ric.cpp single-plane path via the oracle
    if quant == 0:
        plane = (img.astype(np.int16) - 128).astype(np.int16)
    else:
        plane = ((img.astype(np.int16) - 128) << SHIFT).astype(np.int16)
    q = quant_step(quant + SHIFT * 5) if quant else 0
    lam = quant_step(quant + SHIFT * 5 - 7) if quant else 0
    stream = oracle.encode(plane, 5, 1, trans, q, lam)
    rec = oracle.decode(stream, w, h, 5, 1, trans, q)
    if quant == 0:
        ref_out = rec.astype(np.int32) + 128
    else:
        ref_out = np.clip(128 + ((rec.astype(np.int32) + (1 << (SHIFT - 1))) >> SHIFT), 0, 255)
    # +5 bytes: reference container header (magic+dims+flags) for fairness
    ref_bpp = (len(stream) + 9) * 8 / (w * h)
    ref_psnr = psnr(ref_out, img.astype(np.int32))
    ref_exact = np.array_equal(ref_out, img.astype(np.int32))

    tag = f"q={quant:2d} t={trans}"
    print(
        f"{tag}  ours: {ours_bpp:6.3f} bpp {ours_psnr:6.2f} dB exact={ours_exact}"
        f" ({dt:.1f}s) | ref: {ref_bpp:6.3f} bpp {ref_psnr:6.2f} dB exact={ref_exact}"
        f" | bpp ratio {ours_bpp/ref_bpp:5.3f}"
    )
    return ours_bpp / ref_bpp


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "509x263"
    quants = [int(q) for q in sys.argv[2:]] or [0, 9, 20]
    if arg.endswith(".pgm"):
        from ric_tpu.utils import pnm

        img = pnm.read_pnm(arg)
        print(f"{arg} {img.shape[1]}x{img.shape[0]}")
    else:
        w, h = map(int, arg.split("x"))
        img = synthetic(h, w)
        print(f"synthetic {w}x{h}")
    for q in quants:
        trans = 1 if q == 0 else 0
        eval_config(img, q, trans)


if __name__ == "__main__":
    main()
