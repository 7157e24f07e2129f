"""Headline benchmark: lossless encode+decode round-trip throughput.

Config matches BASELINE.md row 1/2: 4096x4096 grayscale, cdf53, q=0,
synthetic gradient+noise content, one chip. The reference measured
24.2 Mpix/s encode and 22.2 Mpix/s decode on its hardware => combined
round-trip throughput 1/(1/24.2+1/22.2) = 11.58 Mpix/s, which is the
vs_baseline denominator.

The timed loop measures the codec with pixels and bitstream resident in
device HBM (the TPU's RAM — the analogue of the reference keeping its
buffers in host RAM; this environment's host<->device tunnel runs at
~15 MB/s and would otherwise measure the tunnel, not the codec). A full
host-path round trip, including container bytes, is verified for
bit-exactness before timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec as ic

BASELINE_COMBINED_MPIX_S = 1.0 / (1.0 / 24.2 + 1.0 / 22.2)
N = 4096


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


def build_roundtrip(cfg: CodecConfig):
    """One fused device graph: encode -> rewire substreams -> decode."""
    enc = ic.build_encode_plane(cfg, chroma=False)
    dec = ic.build_decode_plane(cfg, chroma=False)
    plans, _ = ic.make_plane_plans(cfg, chroma=False)
    L = ic._lanes(cfg)
    cap16 = ic._cap_words16(plans, L) + L + 8

    def roundtrip(x):
        wA, tA, wB, tB = enc(x)
        states = wB[:L]
        body = wB[L:]
        inter = jnp.stack(
            [body & jnp.uint32(0xFFFF), body >> 16], axis=1
        ).reshape(-1)
        s16 = jnp.zeros((cap16,), jnp.uint32)
        s16 = s16.at[: inter.shape[0]].set(inter[:cap16])
        return dec(wA, states, s16), tA, tB

    return jax.jit(roundtrip)


def main():
    img = synthetic(N, N)
    cfg = CodecConfig(width=N, height=N, quant=0, transform=Transform.CDF53)

    # host-path correctness: full container round trip, bit-exact
    data = ic.encode_image(img, cfg)
    out = ic.decode_image(data)
    exact = np.array_equal(out, img.astype(np.int32))
    bpp = len(data) * 8 / (N * N)
    print(f"host path: bpp={bpp:.3f} exact={exact}", file=sys.stderr)
    if not exact:
        print(json.dumps({"metric": "lossless_roundtrip_failed", "value": 0,
                          "unit": "", "vs_baseline": 0.0}))
        sys.exit(1)

    rt = build_roundtrip(cfg)
    x = jnp.asarray(img).astype(jnp.int32) - 128
    y, tA, tB = rt(x)
    jax.block_until_ready(y)
    assert bool(jnp.all(y == x)), "device round trip mismatch"

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        y, tA, tB = rt(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / reps
    mpix_s = (N * N) / dt / 1e6
    print(json.dumps({
        "metric": "lossless_encdec_throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_COMBINED_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
