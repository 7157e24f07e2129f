"""Encode-path breakdown on the real chip: cumulative stage timings.

Stages: payload (DWT+quant+zerotree+fields) -> tables (hist+normalize) ->
rows (slot grid build) -> scan (encode_packed) -> compact (word stream).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from ric_tpu.utils import cache as _cc
_cc.setup(jax)
import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, SHIFT
from ric_tpu.models import image_codec as ic
from ric_tpu.models import tables as tbl
from ric_tpu.ops import rans, bitpack

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
QUANT = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def synthetic(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (96 + 80 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
           + 24 * np.sin((xx + yy) / 11.0) + rng.normal(0, 4, size=(h, w)))
    return np.clip(img, 0, 255).astype(np.uint8)


def _sync(out):
    """Fetch a scalar from one output leaf (block_until_ready does not
    actually wait on the axon tunnel platform; in-order stream + whole-
    program output materialization make one fetch sufficient)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    tr = Transform.CDF53 if QUANT == 0 else Transform.CDF97
    cfg = CodecConfig(width=N, height=N, quant=QUANT, transform=tr)
    plans, dims = ic.make_plane_plans(cfg, False)
    L = ic._lanes(cfg)
    capA = ic._cap_words_a(cfg)
    cap16 = ic._cap_words16(plans, L)
    image_tables = ic._use_image_tables(cfg)
    tctx = tbl.get_table_ctx(tbl.rate_bucket(cfg.quant))
    packed = ic._packed_mode(cfg)

    img = synthetic(N, N)
    x = jnp.asarray(img).astype(jnp.int32) - 128
    if not cfg.lossless:
        x = x << SHIFT

    @jax.jit
    def payload_only(x):
        pay = ic._plane_payload(cfg, plans, x)
        return [p["u"] for p in pay]

    @jax.jit
    def through_tables(x):
        pay = ic._plane_payload(cfg, plans, x)
        hist = ic._hist_from_payload(pay)
        freq = rans.device_normalize(hist, jnp.asarray(tbl._VALID))
        return freq

    @jax.jit
    def through_rows(x):
        pay = ic._plane_payload(cfg, plans, x)
        hist = ic._hist_from_payload(pay)
        freq = rans.device_normalize(hist, jnp.asarray(tbl._VALID))
        enc_tables = rans.enc_dec_tables(freq)
        return ic._encode_rows(plans, pay, enc_tables, L, packed)

    @jax.jit
    def through_scan(x):
        rows = through_rows.__wrapped__(x)
        return rans.encode_packed_sparse(rows, reorder=False)

    @jax.jit
    def through_scan_static(x):
        # the exact pre-compaction prefix of `full` when image_tables is
        # off (static dense tables, no hist): isolates the word-compaction
        # + stream-assembly tail
        pay = ic._plane_payload(cfg, plans, x)
        rows = ic._encode_rows(
            plans, pay, jax.tree_util.tree_map(jnp.asarray, tctx["dense"]),
            L, packed)
        return rans.encode_packed_sparse(rows, reorder=False,
                                         return_nact=True)

    @jax.jit
    def full(x):
        pay = ic._plane_payload(cfg, plans, x)
        return ic._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, pay, packed=packed,
            prefix=ic._prefix_compact(cfg))

    t_pay = timeit(payload_only, x)
    t_tab = timeit(through_tables, x)
    t_rows = timeit(through_rows, x)
    t_scan = timeit(through_scan, x)
    t_scan_s = timeit(through_scan_static, x) if not image_tables else None
    t_full = timeit(full, x)
    mp = N * N / 1e6
    print(f"L={L} rows={ic._plan_rows(plans, L)} image_tables={image_tables}")
    rows_list = [("payload", t_pay), ("+tables", t_tab),
                 ("+rows", t_rows), ("+scan", t_scan)]
    if t_scan_s is not None:
        rows_list.append(("scan_sta", t_scan_s))
    rows_list.append(("full", t_full))
    for name, t in rows_list:
        print(f"{name:9s} {t*1e3:8.1f} ms  {mp/t:8.1f} Mpix/s")


if __name__ == "__main__":
    main()
