"""Video round-trip harness — equivalent of reference utils/testmotion.cpp.

Reads raw 8-bit grayscale frames from a file (or generates synthetic pans),
encodes the sequence, decodes it, and prints per-frame encoded size and
PSNR — the reference prints encoder-side and decoder-side PSNR per frame
(testmotion.cpp:42-64); here encoder reconstruction IS the decoder output
by construction, so one column suffices.

Usage:
  python tools/testmotion.py [WxH] [nframes] [quant] [raw_file]
"""
from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from ric_tpu.models import video_codec
from ric_tpu.utils.metrics import psnr


def synthetic_video(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 55 * np.sin(xx / 13.0) * np.cos(yy / 17.0)
        + 30 * np.sin((2 * xx + yy) / 9.0)
    )
    out = []
    for t in range(n):
        f = np.roll(base, (t, 2 * t), axis=(0, 1)) + rng.normal(0, 2, (h, w))
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return np.stack(out)


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "128x128"
    w, h = map(int, size.split("x"))
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    quant = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if len(sys.argv) > 4:
        raw = np.fromfile(sys.argv[4], np.uint8)
        n = len(raw) // (w * h)
        frames = raw[: n * w * h].reshape(n, h, w)
    else:
        frames = synthetic_video(n, h, w)

    data = video_codec.encode_video(frames, quant=quant)
    out = video_codec.decode_video(data)

    off = 20
    total = 0
    for t in range(n):
        ftype, lmv, la, lb = struct.unpack("<BIII", data[off : off + 13])
        off += 13 + lmv + ((-lmv) % 4) + la + ((-la) % 4) + lb + ((-lb) % 4)
        sz = lmv + la + lb
        total += sz
        print(
            f"frame {t:3d} {'I' if ftype == 0 else 'P'} {sz:7d} B  "
            f"{psnr(out[t], frames[t]):6.2f} dB"
        )
    bpp = total * 8 / (n * w * h)
    print(f"total {total} B  {bpp:.3f} bpp")


if __name__ == "__main__":
    main()
