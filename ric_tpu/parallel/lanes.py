"""Tensor-style within-stage parallelism: the rANS lane axis sharded over
the device mesh (SURVEY.md §2 "tensor-style parallel").

The entropy scan operates on a (T, L) grid whose L lanes are mutually
independent (ops/rans.py); that lane axis is the codec's analogue of a
tensor-parallel hidden dimension. Here the grid carries a GSPMD sharding
constraint P(None, 'sp'), so XLA partitions the scan body across devices
and inserts the collectives (an all-gather of the per-lane emit/word
grids before the raster-order compaction) automatically — the
"annotate shardings, let the compiler place collectives" recipe, no
hand-written communication.

Unlike spatial tiling (mode 1/2), the bitstream is byte-identical to the
single-device encoder by construction: sharding only changes WHERE each
lane's arithmetic runs, not any value.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ric_tpu.config import CodecConfig
from ric_tpu.models import image_codec
from ric_tpu.models import tables as tbl


def build_lane_sharded_encode(cfg: CodecConfig, mesh, chroma: bool = False):
    """Single-plane encoder whose entropy scan is lane-sharded over the
    mesh 'sp' axis. Output == build_encode_plane's, byte for byte."""
    plans, _ = image_codec.make_plane_plans(cfg, chroma)
    L = image_codec._lanes(cfg)
    image_codec._check_plane_size(cfg, plans, L)
    # L is rate-driven (image_codec._lanes) and may be smaller than the
    # mesh axis (e.g. a small q9 plane takes L=4 over sp=8). GSPMD handles
    # a non-divisible lane axis by padding shards, so no assert: the
    # stream stays byte-identical to the single-device encoder either way
    # (sharding changes WHERE lanes run, never any value) — surplus
    # devices just hold padding. Verified by test_lanes.py at L<sp.
    capA = image_codec._cap_words_a(cfg)
    cap16 = image_codec._cap_words16(plans, L)
    image_tables = image_codec._use_image_tables(cfg)
    tctx = tbl.get_table_ctx(image_codec._table_bucket(cfg), chroma)
    lane_sh = NamedSharding(mesh, P(None, "sp"))
    packed = image_codec._packed_mode(cfg)

    def constrain(rows):
        return jax.lax.with_sharding_constraint(rows, lane_sh)

    def encode_plane(x):
        payload = image_codec._plane_payload(cfg, plans, x)
        return image_codec._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            constrain=constrain, packed=packed,
            recon=image_codec._recon_offsets(cfg))

    return jax.jit(encode_plane)
