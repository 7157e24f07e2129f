"""BASELINE config #5 in emulation: 8K RGB over a 2-host-class mesh.

Runs the mode-2 (global-DWT, ppermute-halo) pipeline on a virtual
8-device 2-D grid mesh (spy=2 x sp=4 — the stand-in for a 2-host x
4-chip slice; the shard_map programs are identical on real hardware),
with the color transform and crop/pad paths in play:

  - 8K RGB (7680x4320) lossless cdf53: container encode on the mesh,
    mesh-free decode, bit-exactness asserted
  - same frame lossy cdf97 q9: PSNR sanity
  - odd-dims crop path (7673x4311) lossless: pad_for_grid + crop
  - halo/stitch overhead: mode-2 mesh encode wall time vs the
    communication-free mode-1 tiled encode of the same frame

Usage: python tools/cfg5_smoke.py [--small]   (--small: 1536x864 debug)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel.mesh import make_mesh, make_grid_mesh
from ric_tpu.parallel import tiling
from ric_tpu.utils.container import read_container
from ric_tpu.utils.metrics import psnr


def synthetic_rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        110
        + 70 * np.sin(xx / 151.0) * np.cos(yy / 117.0)
        + 30 * np.sin((2 * xx + yy) / 43.0)
    )
    r = np.clip(base + rng.normal(0, 5, (h, w)), 0, 255)
    g = np.clip(base[::-1] * 0.9 + 20 + rng.normal(0, 5, (h, w)), 0, 255)
    b = np.clip(255 - base + rng.normal(0, 5, (h, w)), 0, 255)
    return np.stack([r, g, b], -1).astype(np.uint8)


def run(h, w):
    tx, ty = 4, 2
    mesh = make_grid_mesh(ty, tx)
    img = synthetic_rgb(h, w)
    npx = h * w

    # lossless RGB, encode ON the mesh, decode mesh-free
    cfg = CodecConfig(width=w, height=h, channels=3, quant=0,
                      transform=Transform.CDF53)
    t0 = time.perf_counter()
    data = tiling.encode_image_tiled_global_container(
        img, cfg, tiles=(tx, ty), mesh=mesh)
    t_mode2 = time.perf_counter() - t0
    out = image_codec.decode_image(data)
    exact = np.array_equal(out, img.astype(np.int32))
    print(f"lossless 8K RGB mode-2: {len(data)} B "
          f"({len(data)*8/npx:.3f} bpp) exact={exact} "
          f"enc {t_mode2:.1f}s ({npx/t_mode2/1e6:.2f} Mpix/s emulated)",
          flush=True)
    assert exact, "mode-2 8K RGB lossless mismatch"

    # lossy q9
    cfgl = CodecConfig(width=w, height=h, channels=3, quant=9,
                       transform=Transform.CDF97)
    t0 = time.perf_counter()
    datal = tiling.encode_image_tiled_global_container(
        img, cfgl, tiles=(tx, ty), mesh=mesh)
    t_lossy = time.perf_counter() - t0
    outl = image_codec.decode_image(datal)
    p = psnr(outl, img.astype(np.int32))
    print(f"lossy q9 8K RGB mode-2: {len(datal)} B "
          f"({len(datal)*8/npx:.3f} bpp) psnr {p:.2f} dB "
          f"enc {t_lossy:.1f}s", flush=True)
    assert p > 33, p

    # crop path: odd dims
    hc, wc = h - 9, w - 7
    cimg = img[:hc, :wc]
    cfgc = CodecConfig(width=wc, height=hc, channels=3, quant=0,
                       transform=Transform.CDF53)
    datac = tiling.encode_image_tiled_global_container(
        cimg, cfgc, tiles=(tx, ty), mesh=mesh)
    outc = image_codec.decode_image(datac)
    assert np.array_equal(outc, cimg.astype(np.int32)), "crop path mismatch"
    print(f"crop path ({hc}x{wc}): exact OK", flush=True)

    # halo/stitch overhead: mode-1 (independent tiles, no collectives) on
    # the same mesh geometry vs the mode-2 time above. Mode-1 container
    # uses a flat 1-D sp mesh over 8 column tiles.
    mesh1 = make_mesh(8, dp=1)
    t0 = time.perf_counter()
    data1 = tiling.encode_image_tiled_container(img, cfg, mesh1)
    t_mode1 = time.perf_counter() - t0
    out1 = image_codec.decode_image(data1)
    assert np.array_equal(out1, img.astype(np.int32))
    print(f"mode-1 same frame: {len(data1)} B enc {t_mode1:.1f}s; "
          f"mode-2 halo+stitch overhead "
          f"{100*(t_mode2-t_mode1)/t_mode1:+.1f}% "
          f"(rate delta {100*(len(data)-len(data1))/len(data1):+.2f}%)",
          flush=True)


if __name__ == "__main__":
    if "--small" in sys.argv:
        run(864, 1536)
    else:
        run(4320, 7680)
