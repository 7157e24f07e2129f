"""Multi-device scaling measurement on the virtual CPU mesh (VERDICT r3
item 6; north star: >=70% scaling 1 chip -> 2-host slice).

Real multi-chip hardware is not reachable from this box, so this measures
what CAN be measured here:
  * strong scaling of mode-1 (independent tiles) and mode-2 (global-DWT,
    ppermute halos) encode over 1/2/4/8 virtual CPU devices — fixed total
    work, per-device efficiency E(n) = T(1) / T(n).
  * the mode-2/mode-1 ratio at each n: the halo-exchange + stitching
    overhead, which IS the part that rides ICI on real hardware.
The box has 4 physical cores, so n=8 rows carry an oversubscription
caveat (printed); the 1->4 rows are the honest scaling signal.

Writes scaling JSON lines; paste the table into PARITY.md.

Usage: python tools/scaling.py [H W]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel import tiling
from ric_tpu.parallel.mesh import make_mesh


def synthetic(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (96 + 80 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
           + 24 * np.sin((xx + yy) / 11.0) + rng.normal(0, 4, (h, w)))
    return np.clip(img, 0, 255).astype(np.uint8)


def timeit(fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    img = synthetic(h, w)
    x = jnp.asarray(img, jnp.int32) - 128
    results = []
    t1_mode1 = t1_mode2 = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n, dp=1)
        # mode 1: independent per-tile codecs over sp
        tcfg = CodecConfig(width=w // n, height=h, quant=0,
                           transform=Transform.CDF53)
        fn1 = tiling.build_tiled_encode(tcfg, mesh)
        t_m1 = timeit(fn1, x[None])
        # mode 2: global DWT with ppermute halos
        cfg = CodecConfig(width=w, height=h, quant=0,
                          transform=Transform.CDF53)
        fn2 = tiling.build_tiled_encode_global(cfg, mesh)
        t_m2 = timeit(fn2, x)
        if n == 1:
            t1_mode1, t1_mode2 = t_m1, t_m2
        row = {
            "devices": n,
            "mode1_ms": round(t_m1 * 1e3, 1),
            "mode2_ms": round(t_m2 * 1e3, 1),
            "mode1_eff": round(t1_mode1 / t_m1 / n * n, 3)
            if n == 1 else round(t1_mode1 / t_m1, 3),
            "mode2_eff": round(t1_mode2 / t_m2, 3),
            "halo_overhead": round(t_m2 / t_m1 - 1, 3),
            "oversubscribed": n > os.cpu_count(),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    # single-chip tiled-vs-untiled efficiency (mode-1 grid on ONE device)
    enc = image_codec.build_encode_plane(
        CodecConfig(width=w, height=h, quant=0, transform=Transform.CDF53),
        chroma=False)
    t_untiled = timeit(jax.jit(enc), x)
    print(json.dumps({
        "untiled_ms": round(t_untiled * 1e3, 1),
        "tiled1_vs_untiled": round(t_untiled / results[0]["mode1_ms"] * 1e3, 3),
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
