"""16384x16384 encode smoke test (VERDICT round-1 item 8).

A 16k x 16k plane is past the single-tile int32 stream ceiling
(image_codec.PlaneTooLarge); the supported route is the tiled container
(4x4 grid of 4096^2 tiles here — the same per-tile graphs bench.py
compiles). Pixels and streams stay resident in device HBM like bench.py:
this environment's host<->device tunnel runs at ~15 MB/s, so a host-path
16k image would measure the tunnel, not the codec.

Prints per-tile exactness and whole-image throughput.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec as ic

N = 16384
T = 4096  # tile side; 4x4 grid


def main():
    cfg = CodecConfig(width=N, height=N, quant=0, transform=Transform.CDF53)
    # the untiled path must refuse cleanly
    try:
        ic.build_encode_plane(cfg, chroma=False)
        raise AssertionError("expected PlaneTooLarge")
    except ic.PlaneTooLarge:
        print("untiled 16k x 16k correctly rejected (PlaneTooLarge)")

    tcfg = CodecConfig(width=T, height=T, quant=0, transform=Transform.CDF53)
    enc = ic.build_encode_plane(tcfg, chroma=False)
    dec = ic.build_decode_plane(tcfg, chroma=False)
    plans, _ = ic.make_plane_plans(tcfg, chroma=False)
    L = ic._lanes(tcfg)
    cap16 = ic._cap_words16(plans, L) + L + 8

    @jax.jit
    def tile_img(sy, sx):
        yy = jnp.arange(T)[:, None] + sy
        xx = jnp.arange(T)[None, :] + sx
        img = (
            96
            + 80 * jnp.sin(xx / 37.0) * jnp.cos(yy / 29.0)
            + 24 * jnp.sin((xx + yy) / 11.0)
            + 20 * jnp.sin(yy * xx / 9573.0)
        )
        return jnp.clip(img, 0, 255).astype(jnp.int32) - 128

    @jax.jit
    def rewire(wA, wB):
        # wB is uint16 wire layout: [2L state halves][u16 words]
        states = jax.lax.bitcast_convert_type(
            wB[: 2 * L].reshape(L, 2), jnp.uint32)
        body = wB[2 * L :].astype(jnp.uint32)
        s16 = jnp.zeros((cap16,), jnp.uint32)
        s16 = s16.at[: body.shape[0]].set(body[:cap16])
        return wA, states, s16

    @jax.jit
    def check(y, x):
        return jnp.all(y == x)

    def roundtrip_tile(sy, sx):
        # separate (cached) enc/dec executables, like bench.py
        x = tile_img(sy, sx)
        wA, tA, wB, tB = enc(x)
        y = dec(*rewire(wA, wB))
        return check(y, x), tB

    # warm (compile)
    ok, tB = roundtrip_tile(jnp.int32(0), jnp.int32(0))
    np.asarray(ok)
    t0 = time.perf_counter()
    bits = 0
    for j in range(4):
        for i in range(4):
            ok, tB = roundtrip_tile(jnp.int32(j * T), jnp.int32(i * T))
            assert bool(ok), f"tile {j},{i} mismatch"
            bits += int(tB)
    dt = time.perf_counter() - t0
    mpixs = N * N / dt / 1e6
    print(f"16384x16384 lossless tiled round trip: exact, "
          f"{dt:.2f}s = {mpixs:.1f} Mpix/s combined, "
          f"{bits / (N * N):.3f} bpp")


if __name__ == "__main__":
    main()
