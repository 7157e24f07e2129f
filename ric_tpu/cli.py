"""`ric`-compatible command line (reference ric.cpp:306-360).

Flags: -i input, -o output, -q quant (0..31, 0=lossless), -t transform
(0:cdf97 1:cdf53 2:haar, defaults to cdf53 when lossless), -d dither.
A `.ric`/`.rtp` input extension selects decode.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _bayer(n: int) -> np.ndarray:
    """n x n ordered-dither index matrix (n a power of two), values
    0..n^2-1, built by the standard recursive quadrant doubling."""
    m = np.zeros((1, 1), np.int32)
    while m.shape[0] < n:
        m = np.block([[4 * m + 0, 4 * m + 2], [4 * m + 3, 4 * m + 1]])
    return m


_BAYER16 = _bayer(16)


def dither(plane: np.ndarray, shift: int = 4) -> np.ndarray:
    """Dithered 12-bit -> 8-bit requantization for the lossy output path
    (covers the reference's `-d` flag, ric.cpp:51-74, which uses serial
    error diffusion). Redesigned as ordered dithering: truncation noise is
    decorrelated by a tiled 16x16 Bayer threshold in [0, 2^shift), making
    the whole operation one vectorized expression — O(1) depth instead of
    an O(H*W) serial pixel walk, and identical output on any tiling."""
    p = plane.astype(np.int32)
    h, w = p.shape
    t = np.tile(_BAYER16 >> (8 - shift), ((h + 15) // 16, (w + 15) // 16))
    v = (p + t[:h, :w]) >> shift
    return np.clip(v + 128, 0, 255)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="ric", description="TPU-native Rududu-capability image codec"
    )
    ap.add_argument("-i", dest="infile", required=True)
    ap.add_argument("-o", dest="outfile", default="")
    ap.add_argument("-q", dest="quant", type=int, default=9,
                    help="quantizer: 0 (lossless) .. 31")
    ap.add_argument("-t", dest="trans", type=int, default=None,
                    help="0:cdf97 1:cdf53 2:haar (default 1 if lossless)")
    ap.add_argument("-d", dest="dither", action="store_true")
    ap.add_argument("--dither-alg", default="ed", choices=("ed", "bayer"),
                    help="-d algorithm: ed = serpentine error diffusion "
                         "(native, the reference's -d class); bayer = "
                         "ordered 16x16 threshold (vectorized, "
                         "tiling-invariant)")
    ap.add_argument("-l", dest="levels", type=int, default=5)
    ap.add_argument("--tiles", default="",
                    help="TXxTY tile grid (e.g. 4x2): single-device tiled "
                         "encode for very large images")
    ap.add_argument("--gtiles", default="",
                    help="TXxTY GLOBAL-DWT tile grid (mode 2): tiles share "
                         "one global wavelet transform (no tile seams), "
                         "per-tile entropy substreams; encodes on one "
                         "device or a device mesh, decodes anywhere")
    ap.add_argument("--profile", default="rans",
                    choices=("rans", "archival", "dct"),
                    help="rans: parallel TPU profile; archival: serial "
                         "adaptive range coder (max compression); dct: "
                         "lapped binDCT intra profile (lossy)")
    ap.add_argument("--lanes", type=int, default=-1,
                    help="log2 rANS lane count (speed/rate knob; "
                         "default: rate-aware auto)")
    ap.add_argument("--no-check", action="store_true",
                    help="drop the container CRC (4 B): the bare envelope "
                         "the reference format ships; corruption then "
                         "decodes to garbage instead of raising")
    args = ap.parse_args(argv)
    if (args.gtiles or args.tiles) and args.profile != "rans":
        # the tiled paths always encode the rans mode-1/mode-2 profiles;
        # silently ignoring --profile here would ship the wrong stream
        ap.error(f"--{'gtiles' if args.gtiles else 'tiles'} supports only "
                 f"--profile rans (got {args.profile})")

    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.models import image_codec
    from ric_tpu.utils import pnm

    infile = args.infile
    decode_mode = infile.endswith((".ric", ".rtp"))

    if decode_mode:
        out = args.outfile or infile + ".pnm"
        with open(infile, "rb") as f:
            data = f.read()
        img = image_codec.decode_image(
            data, dither=(args.dither_alg if args.dither else False))
        from ric_tpu.utils.container import read_container

        cfg = read_container(data)[0]
        dt = np.uint16 if cfg.input_depth == 16 else np.uint8
        pnm.write_pnm(out, img.astype(dt))
        return 0

    trans = args.trans
    if trans is None:
        trans = 1 if args.quant == 0 else 0
    img = pnm.read_pnm(infile)
    h, w = img.shape[:2]
    cfg = CodecConfig(
        width=w, height=h, channels=3 if img.ndim == 3 else 1,
        quant=max(0, min(args.quant, 31)), transform=Transform(trans),
        levels=args.levels,
        input_depth=16 if img.dtype.itemsize > 1 else 8,
        lanes_log2=args.lanes,
    )
    if args.gtiles:
        from ric_tpu.parallel import tiling

        tx, ty = (int(v) for v in args.gtiles.lower().split("x"))
        data = tiling.encode_image_tiled_global_container(
            img, cfg, tiles=(tx, ty))
    elif args.tiles:
        tx, ty = (int(v) for v in args.tiles.lower().split("x"))
        data = image_codec.encode_image_tiles(img, cfg, tiles=(tx, ty))
    elif args.profile == "dct":
        from ric_tpu.models import dct_codec

        data = dct_codec.encode_image_dct(img, cfg)
    else:
        data = image_codec.encode_image(img, cfg, profile=args.profile,
                                        check=not args.no_check)
    out = args.outfile
    if not out:
        stem, _ = os.path.splitext(infile)
        out = stem + ".ric"
    with open(out, "wb") as f:
        f.write(data)
    bpp = len(data) * 8 / (w * h)
    print(f"{len(data)} bytes  {bpp:.3f} bpp", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
