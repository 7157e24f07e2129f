"""Offline rANS table fitting — the huffgen equivalent
(reference utils/huffgen.cpp + GENERATE_HUFF_STATS flow, SURVEY.md §3.4).

Accumulates (table, symbol) histograms from the shared encoder front half
over a corpus of synthetic content classes and quantizers, then writes
ric_tpu/models/tables.npz (picked up by ric_tpu.models.tables at import).

Usage: python tools/tablegen.py [out.npz]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, SHIFT
from ric_tpu.models import image_codec, tables as tbl


def corpus(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = []
    # smooth gradients + sinusoids
    imgs.append(96 + 80 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
                + 24 * np.sin((xx + yy) / 11.0))
    # textured
    imgs.append(128 + 40 * np.sin(xx * yy / 797.0) + rng.normal(0, 12, (h, w)))
    # edges / blocks
    blocksy = ((yy // 31) + (xx // 23)) % 2
    imgs.append(60 + 140 * blocksy + rng.normal(0, 3, (h, w)))
    # natural-ish 1/f noise
    f = np.fft.fftfreq(h)[:, None] ** 2 + np.fft.fftfreq(w)[None, :] ** 2
    spec = (rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))) / np.sqrt(
        f + 1e-4
    )
    pink = np.fft.ifft2(spec).real
    pink = 128 + 60 * pink / np.abs(pink).max()
    imgs.append(pink)
    return [np.clip(i, 0, 255).astype(np.uint8) for i in imgs]


def natural_corpus(h, w, color=False, only=None):
    """Natural test images from corpus (tools' corpus prep), cropped
    or tiled to (h, w); grayscale PGMs or (with color=True) RGB PPMs.
    `only`: optional set of path substrings — held-out-split fitting."""
    import glob

    from ric_tpu.utils import pnm

    out = []
    pat = "corpus/*.ppm" if color else "corpus/*.pgm"
    for path in sorted(glob.glob(pat)):
        if only is not None and not any(s in path for s in only):
            continue
        img = pnm.read_pnm(path)
        if color and img.ndim != 3:
            continue
        ih, iw = img.shape[:2]
        reps = (-(-h // ih), -(-w // iw)) + ((1,) if img.ndim == 3 else ())
        img = np.tile(img, reps)[:h, :w]
        out.append(img)
    return out


# representative quants per rate bucket
BUCKET_QUANTS = {0: (0,), 1: (4, 6), 2: (9, 12), 3: (16, 20, 24)}


def main():
    # args: [out.npz] [--only substr,substr,...]  (held-out-split fitting:
    # natural images whose path contains none of the substrings are
    # EXCLUDED from the fit so they can serve as the eval half)
    args = [a for a in sys.argv[1:]]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    out = args[0] if args else "ric_tpu/models/tables.npz"
    rng = np.random.default_rng(42)
    # (2, buckets, tables, alphabet): [0] luma/gray stats, [1] chroma
    hists = np.zeros(
        (2, tbl.N_BUCKETS, tbl.N_FINE, tbl.ALPHABET), np.float64)
    h = w = 512
    imgs = corpus(rng, h, w) + natural_corpus(h, w, only=only)
    for img in imgs:
        for bucket, quants in BUCKET_QUANTS.items():
            for quant in quants:
                trans = Transform.CDF53 if quant == 0 else Transform.CDF97
                cfg = CodecConfig(width=w, height=h, quant=quant,
                                  transform=trans)
                fn = image_codec.build_plane_stats_fine(cfg, False)
                if quant == 0:
                    x = img.astype(np.int32) - 128
                else:
                    x = (img.astype(np.int32) - 128) << SHIFT
                hcounts = fn(jnp.asarray(x, jnp.int32))
                hists[0, bucket] += np.asarray(hcounts, np.float64)
        print(f"luma image done; total syms {hists.sum():.3e}", flush=True)
    # chroma stats: Cg/Co planes of the color corpus under the chroma
    # quant boost (C_Q_BOOST) — these are far sparser than luma
    for img in natural_corpus(h, w, color=True, only=only):
        x32 = jnp.asarray(img, jnp.int32)
        for bucket, quants in BUCKET_QUANTS.items():
            for quant in quants:
                trans = Transform.CDF53 if quant == 0 else Transform.CDF97
                cfg = CodecConfig(width=w, height=h, quant=quant,
                                  transform=trans, channels=3)
                fn = image_codec.build_plane_stats_fine(cfg, True)
                y, co, cg = image_codec.rgb_to_ycocg(
                    x32, 0 if quant == 0 else SHIFT)
                for plane in (cg, co):
                    hcounts = fn(plane)
                    hists[1, bucket] += np.asarray(hcounts, np.float64)
        print(f"chroma image done; total syms {hists.sum():.3e}", flush=True)
    # the stats configs are all sub-4-Mpix (sfine), so S counts land in
    # the SF16 rows; marginalize them down to the pml4 rows big planes
    # scan with (sum over the parML values of each pml4 class) — without
    # this the >=4-Mpix S tables would normalize from zero counts to
    # uniform (caught as a 2x bpp regression on the 4096^2 bench).
    a16 = np.arange(16)
    pml4 = ((a16 > 0).astype(int) + (a16 > 2).astype(int)
            + (a16 > 5).astype(int))
    for lvlc in range(3):
        b16 = tbl.s16_fine_base(lvlc)
        b4 = tbl.s_fine_base(lvlc)
        sf = np.zeros((2, tbl.N_BUCKETS, 4, 16, tbl.ALPHABET))
        for p in range(16):
            sf[:, :, int(pml4[p])] += hists[
                :, :, b16 + p * 16 : b16 + (p + 1) * 16]
        hists[:, :, b4 : b4 + 64] = sf.reshape(
            2, tbl.N_BUCKETS, 64, tbl.ALPHABET)
    np.savez(out, counts=hists)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
