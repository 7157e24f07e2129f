"""Headline benchmark: every BASELINE.md throughput row, one chip.

Rows (4096x4096 grayscale, synthetic gradient+noise content):
  lossless  cdf53 q=0   (encode 24.2 / decode 22.2 Mpix/s reference)
  lossy q9  cdf97       (encode 33.9 / decode 37.5)
  lossy q20 cdf97       (encode 59.0 / decode 54.4)

Encode and decode are timed separately with pixels and bitstream resident
in device HBM (the TPU's RAM — the analogue of the reference keeping its
buffers in host RAM; this environment's host<->device tunnel runs at
~15 MB/s and would otherwise measure the tunnel, not the codec). A full
host-path round trip, including container bytes, is verified for
bit-exactness (lossless) / PSNR sanity (lossy) before timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "rows"}.
The headline value is the combined lossless round-trip throughput
1/(1/enc+1/dec) vs the reference's 11.58 Mpix/s; "rows" carries the
per-config encode/decode numbers and their vs-reference ratios.
"""
import json
import sys
import time

import numpy as np

import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, SHIFT
from ric_tpu.models import image_codec as ic

BASELINE_COMBINED_MPIX_S = 1.0 / (1.0 / 24.2 + 1.0 / 22.2)
N = 4096
ROWS = [
    ("lossless", dict(quant=0, transform=Transform.CDF53), 24.2, 22.2),
    ("lossy_q9", dict(quant=9, transform=Transform.CDF97), 33.9, 37.5),
    ("lossy_q20", dict(quant=20, transform=Transform.CDF97), 59.0, 54.4),
]


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


def measure_reference(img, cfg: CodecConfig, reps=2):
    """Drive the compiled reference (golden oracle, tools/oracle) over the
    SAME content on this box's CPU, so vs_enc/vs_dec compare identical work
    at identical rate (VERDICT r2 weak #2: the survey-era numbers were
    measured on different content/entropy). Returns None if the reference
    library can't be built here."""
    try:
        sys.path.insert(0, "tools")
        from oracle import oracle
        from ric_tpu.config import quant_step

        h, w = img.shape
        if cfg.lossless:
            plane = (img.astype(np.int16) - 128).astype(np.int16)
            q = lam = 0
        else:
            plane = ((img.astype(np.int16) - 128) << SHIFT).astype(np.int16)
            q = quant_step(cfg.quant + SHIFT * 5)
            lam = quant_step(cfg.quant + SHIFT * 5 - 7)
        trans = int(cfg.transform)
        stream = oracle.encode(plane, cfg.levels, 1, trans, q, lam)
        t0 = time.perf_counter()
        for _ in range(reps):
            stream = oracle.encode(plane, cfg.levels, 1, trans, q, lam)
        dt_e = (time.perf_counter() - t0) / reps
        rec = oracle.decode(stream, w, h, cfg.levels, 1, trans, q)
        t0 = time.perf_counter()
        for _ in range(reps):
            rec = oracle.decode(stream, w, h, cfg.levels, 1, trans, q)
        dt_d = (time.perf_counter() - t0) / reps
        if cfg.lossless:
            assert np.array_equal(rec.astype(np.int32) + 128,
                                  img.astype(np.int32))
        return {
            "ref_bpp": round((len(stream) + 9) * 8 / (w * h), 3),
            "ref_enc_mpix_s": round(w * h / dt_e / 1e6, 2),
            "ref_dec_mpix_s": round(w * h / dt_d / 1e6, 2),
        }
    except Exception as e:  # oracle unavailable (no /root/reference)
        print(f"reference measurement skipped: {e}", file=sys.stderr)
        return None


def build_pair(cfg: CodecConfig):
    """Encode fn and a decode fn taking the encoder's device outputs."""
    enc = ic.build_encode_plane(cfg, chroma=False)
    dec = ic.build_decode_plane(cfg, chroma=False)
    plans, _ = ic.make_plane_plans(cfg, chroma=False)
    L = ic._lanes(cfg)
    cap16 = ic._cap_words16(plans, L) + L + 8

    def rewire(wA, wB):
        # wB is uint16 wire layout: [2L state halves][u16 words]
        states = jax.lax.bitcast_convert_type(
            wB[: 2 * L].reshape(L, 2), jnp.uint32)
        body = wB[2 * L :].astype(jnp.uint32)
        s16 = jnp.zeros((cap16,), jnp.uint32)
        s16 = s16.at[: body.shape[0]].set(body[:cap16])
        return wA, states, s16

    return enc, jax.jit(rewire), dec


def _sync(out):
    """Force real completion: fetch a scalar from one output (outputs of a
    single XLA program materialize together, and the stream is in-order).
    On the axon tunnel platform block_until_ready returns before the
    device finishes; a host fetch cannot."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def timeit(fn, args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    img = synthetic(N, N)
    rows_out = {}
    headline = None

    for name, kw, base_enc, base_dec in ROWS:
        cfg = CodecConfig(width=N, height=N, **kw)
        # host-path correctness first
        data = ic.encode_image(img, cfg)
        out = ic.decode_image(data)
        bpp = len(data) * 8 / (N * N)
        if cfg.lossless:
            ok = np.array_equal(out, img.astype(np.int32))
            q = None
        else:
            err = (out.astype(np.float64) - img.astype(np.float64))
            mse = float(np.mean(err * err))
            q = 10 * np.log10(255.0**2 / mse)
            ok = q > 30.0
        print(f"{name}: bpp={bpp:.3f} "
              + (f"psnr={q:.2f} " if q else "exact ")
              + f"ok={ok}", file=sys.stderr)
        if not ok:
            print(json.dumps({"metric": f"{name}_failed", "value": 0,
                              "unit": "", "vs_baseline": 0.0}))
            sys.exit(1)

        ref = measure_reference(img, cfg)

        enc, rewire, dec = build_pair(cfg)
        x = jnp.asarray(img).astype(jnp.int32) - 128
        if not cfg.lossless:
            x = x << SHIFT
        dt_e, (wA, tA, wB, tB) = timeit(enc, (x,))
        dargs = rewire(wA, wB)
        jax.block_until_ready(dargs)
        dt_d, y = timeit(dec, dargs)
        if cfg.lossless:
            assert bool(jnp.all(y == x)), f"{name}: device decode mismatch"
        enc_mpixs = N * N / dt_e / 1e6
        dec_mpixs = N * N / dt_d / 1e6
        rows_out[name] = {
            "enc_mpix_s": round(enc_mpixs, 2),
            "dec_mpix_s": round(dec_mpixs, 2),
            "vs_enc": round(enc_mpixs / base_enc, 2),
            "vs_dec": round(dec_mpixs / base_dec, 2),
            "bpp": round(bpp, 3),
        }
        if ref is not None:
            # content-matched comparison: same pixels, same rate regime —
            # vs_enc/vs_dec above keep the survey-era rows for continuity
            rows_out[name].update(ref)
            rows_out[name]["vs_enc_matched"] = round(
                enc_mpixs / ref["ref_enc_mpix_s"], 2)
            rows_out[name]["vs_dec_matched"] = round(
                dec_mpixs / ref["ref_dec_mpix_s"], 2)
        if name == "lossless":
            headline = 1.0 / (1.0 / enc_mpixs + 1.0 / dec_mpixs)
        print(f"{name}: enc {enc_mpixs:.1f} ({enc_mpixs/base_enc:.2f}x) "
              f"dec {dec_mpixs:.1f} ({dec_mpixs/base_dec:.2f}x)"
              + (f" | ref measured enc {ref['ref_enc_mpix_s']:.1f} "
                 f"dec {ref['ref_dec_mpix_s']:.1f} bpp {ref['ref_bpp']}"
                 if ref else ""),
              file=sys.stderr)

    # roofline check (VERDICT r3 #2): triad-achievable bandwidth vs the
    # DWT stage's bytes-moved model (tools/roofline.py has the full
    # per-stage table; the scans are latency-bound, not traffic-bound)
    roof = {}
    try:
        from ric_tpu.ops import lifting
        from ric_tpu.config import Transform as _T

        nw = 1 << 28
        xw = jnp.arange(nw, dtype=jnp.int32)
        triad = jax.jit(lambda v: v + 1)
        dt_t, _ = timeit(triad, (xw,), reps=8)
        bw = 2 * nw * 4 / dt_t
        dwt = jax.jit(lambda v: lifting.dwt(v, _T.CDF53, 5))
        xq0 = jnp.asarray(img).astype(jnp.int32) - 128
        dt_d, _ = timeit(dwt, (xq0,), reps=8)
        model_bytes = (4 * 3 + 2) * 4 * 1.33 * N * N  # see tools/roofline.py
        roof = {
            "triad_gbs": round(bw / 1e9, 1),
            "dwt_ms": round(dt_d * 1e3, 2),
            "dwt_bw_util": round(100 * model_bytes / dt_d / bw, 1),
        }
    except Exception as e:  # pragma: no cover - measurement best-effort
        print(f"roofline row skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "lossless_encdec_throughput",
        "value": round(headline, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(headline / BASELINE_COMBINED_MPIX_S, 2),
        "rows": rows_out,
        "roofline": roof,
    }))


if __name__ == "__main__":
    main()
