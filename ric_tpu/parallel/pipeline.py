"""Pipeline-parallel encode (SURVEY.md §2: transform / quantize+R-D /
entropy-pack as overlappable stages for streaming throughput).

Stage 1 (DWT + TSUQ/R-D + payload extraction — the MXU/VPU-heavy math)
and stage 2 (entropy phases + rANS scan + word compaction) run on two
different devices. Dispatches are asynchronous, so while the entropy
device packs image t, the transform device is already lifting image t+1,
and the inter-stage payload transfer rides the interconnect concurrently
— a classic 2-stage device pipeline with the host loop as scheduler.

The per-image bitstream is byte-identical to the single-device encoder
(the stages are a pure split of build_encode_plane's graph), so pipelining
is purely a throughput feature. Steady-state throughput approaches
1 / max(t_transform, t_entropy) instead of 1 / (t_transform + t_entropy).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ric_tpu.config import CodecConfig
from ric_tpu.models import image_codec
from ric_tpu.models import tables as tbl


def build_pipeline_encoder(cfg: CodecConfig, dev_transform, dev_entropy,
                           chroma: bool = False):
    """Returns encode_stream: iterable of (H, W) int32 working-domain
    planes -> list of (wordsA, totalA, wordsB, totalB) host tuples.

    dev_transform runs the wavelet/quantize stage; dev_entropy the
    entropy/pack stage. Pass the same device twice for a (still correct)
    single-device run.
    """
    plans, _ = image_codec.make_plane_plans(cfg, chroma)
    L = image_codec._lanes(cfg)
    image_codec._check_plane_size(cfg, plans, L)
    capA = image_codec._cap_words_a(cfg)
    cap16 = image_codec._cap_words16(plans, L)
    image_tables = image_codec._use_image_tables(cfg)
    tctx = tbl.get_table_ctx(image_codec._table_bucket(cfg), chroma)
    packed = image_codec._packed_mode(cfg)

    def stage1(x):
        payload = image_codec._plane_payload(cfg, plans, x)
        # strip the static BandPlan so the pytree is pure arrays
        return tuple(
            {k: v for k, v in pay.items() if k != "plan"} for pay in payload
        )

    def stage2(payload_arrays):
        payload = [
            dict(pay, plan=p) for pay, p in zip(payload_arrays, plans)
        ]
        return image_codec._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            packed=packed, recon=image_codec._recon_offsets(cfg))

    stage1_j = jax.jit(stage1)
    stage2_j = jax.jit(stage2)

    def encode_stream(planes):
        results = []
        in_flight = None  # payload already moving to / on dev_entropy
        for x in planes:
            xa = jax.device_put(jnp.asarray(x, jnp.int32), dev_transform)
            pay = stage1_j(xa)                      # async on transform dev
            if in_flight is not None:
                results.append(stage2_j(in_flight))  # async on entropy dev
            in_flight = jax.device_put(pay, dev_entropy)  # async transfer
        if in_flight is not None:
            results.append(stage2_j(in_flight))
        # materialize on host in order
        return [
            (np.asarray(wA), int(tA), np.asarray(wB), int(tB))
            for (wA, tA, wB, tB) in results
        ]

    return encode_stream
