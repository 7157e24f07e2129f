"""Video parity harness — equivalent of reference utils/testmotion.cpp,
extended to print ours-vs-reference size + PSNR per frame (the reference
codec is driven through the compiled oracle's CRududuCodec surface).

Both codecs see the same RGB frames; PSNR is computed per YCoCg plane in
the shared working domain (Y<<4 offset -128, Co/Cg<<3 — image.cpp
inputSGI == our rgb_to_ycocg(x, 4)), encoder-side reconstruction vs
source, exactly like testmotion.cpp:42-64 prints.

Usage:
  python tools/testmotion.py [WxH] [nframes] [quant] [raw_rgb_file]
"""
from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
from ric_tpu.models import image_codec, video_codec


def synthetic_video(n, h, w, seed=3, color=True):
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
        g = np.clip(f, 0, 255).astype(np.uint8)
        if color:
            out.append(np.stack([g, np.roll(g, 5, 1), 255 - g], axis=-1))
        else:
            out.append(g)
    return np.stack(out)


def plane_psnr(a, b):
    """PSNR in the 12-bit working domain (reference image.cpp:248-265)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(d * d, axis=(-2, -1))
    return 10 * np.log10((4095.0**2) / np.maximum(mse, 1e-12))


def frame_sizes(data, n, channels):
    """Per-frame (total, mv_bytes, residual_bytes) from our RTV1
    container — the MV-vs-residual split of VERDICT r3 #9."""
    off = 22
    nlen = 1 + 2 * channels
    sizes = []
    for _ in range(n):
        lens = struct.unpack(
            f"<{nlen}I", data[off + 1 : off + 1 + 4 * nlen])
        off += 1 + 4 * nlen
        for ln in lens:
            off += ln + ((-ln) % 4)
        sizes.append((sum(lens), lens[0], sum(lens[1:])))
    return sizes


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "128x128"
    w, h = map(int, size.split("x"))
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    quant = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if len(sys.argv) > 4:
        raw = np.fromfile(sys.argv[4], np.uint8)
        n = len(raw) // (w * h * 3)
        frames = raw[: n * w * h * 3].reshape(n, h, w, 3)
    else:
        frames = synthetic_video(n, h, w)

    # ours: full sequence encode + decode (fused device pipeline)
    data = video_codec.encode_video(frames, quant=quant)
    out = video_codec.decode_video(data)
    our_sizes = frame_sizes(data, n, 3)

    # reference via oracle. PSNR uses the DECODER-side reconstruction for
    # both codecs: the reference's encoder-side in-loop recon differs from
    # its decoder's (pruned blocks keep their quantized coeffs on the
    # encoder side, bandcodec.cpp:528-537 vs the decoder's Clear()), so
    # its P-frame chain drifts; ours is drift-free by construction.
    from tools.oracle.oracle import VideoOracle

    enc = VideoOracle(w, h, "encode", quant)
    dec = VideoOracle(w, h, "decode", quant)
    ref_sizes, ref_psnrs, ref_mvs = [], [], []
    for t in range(n):
        stream, sz, _ = enc.encode(frames[t])
        ref_mvs.append(enc.mv_bytes())
        recon = dec.decode(stream)
        src = np.stack(image_codec.rgb_to_ycocg(
            frames[t].astype(np.int32), 4))
        # reference plane order is Y, Co, Cg; ours is Y, Cg, Co
        ref = recon[[0, 2, 1]].astype(np.int32)
        ref_sizes.append(sz)
        ref_psnrs.append(plane_psnr(src, ref))
    enc.close()
    dec.close()

    print("frame  type   ours(B)  [mv+res]       ref(B)  [mv]   "
          "ours Y/Cg/Co dB      ref Y/Cg/Co dB")
    tot_o = tot_r = tot_mv = tot_rmv = 0
    for t in range(n):
        src = np.stack(image_codec.rgb_to_ycocg(
            frames[t].astype(np.int32), 4))
        ours = np.stack(image_codec.rgb_to_ycocg(
            out[t].astype(np.int32), 4))
        po = plane_psnr(src, ours)
        pr = ref_psnrs[t]
        tot, mv, res = our_sizes[t]
        tot_o += tot
        tot_mv += mv
        tot_r += ref_sizes[t]
        tot_rmv += ref_mvs[t]
        print(f"{t:4d} {'I' if t % video_codec.GOP_DEFAULT == 0 else 'P':>4}"
              f" {tot:9d} [{mv:5d}+{res:7d}] {ref_sizes[t]:8d} "
              f"[{ref_mvs[t]:5d}]   "
              f"{po[0]:5.2f}/{po[1]:5.2f}/{po[2]:5.2f}   "
              f"{pr[0]:5.2f}/{pr[1]:5.2f}/{pr[2]:5.2f}")
    npx = n * w * h
    print(f"total ours {tot_o} B ({tot_o * 8 / npx:.3f} bpp, "
          f"mv {tot_mv} B = {100 * tot_mv / max(tot_o, 1):.1f}%)  "
          f"ref {tot_r} B ({tot_r * 8 / npx:.3f} bpp, mv {tot_rmv} B)  "
          f"ratio {tot_o / max(tot_r, 1):.3f}  "
          f"mv ratio {tot_mv / max(tot_rmv, 1):.3f}")


if __name__ == "__main__":
    main()
