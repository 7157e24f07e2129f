"""Spatially tiled multi-device encode with deterministic stream stitching.

Mode 1 (this module): independent tiles. The image is split into column
tiles sharded over the mesh's `sp` axis (plus a `dp` batch axis); every
device runs the full per-tile encode pipeline locally; per-tile substream
lengths are gathered and the container stitches substreams in tile order —
bitstreams are identical regardless of mesh shape (determinism test in
tests/test_parallel.py). Tile boundaries are real codec boundaries (the
container records tiles_x/tiles_y), which also gives parallel decode and
corruption localization (SURVEY.md §5).

Mode 2 (global DWT with ppermute halo exchange, tiled==untiled bit-identical)
is the L5 follow-up; see SURVEY.md §7 hard part #4.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ric_tpu.config import CodecConfig
from ric_tpu.models import image_codec


def build_tiled_encode(tile_cfg: CodecConfig, mesh):
    """Returns fn: (B, H, W) int32 -> (words (B, sp, cap), totals (B, sp)).

    B must equal mesh dp size; W = sp * tile_cfg.width; H = tile_cfg.height.
    """
    enc = image_codec.build_encode_plane(tile_cfg, chroma=False)

    def local(xt):
        # xt: (b_local, H, tile_w)
        wA, tA, wB, tB = jax.vmap(enc)(xt)
        return wA[:, None], tA[:, None], wB[:, None], tB[:, None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None, "sp"),),
        out_specs=(
            P("dp", "sp", None), P("dp", "sp"),
            P("dp", "sp", None), P("dp", "sp"),
        ),
    )
    return jax.jit(fn)


def encode_image_tiled(img: np.ndarray, cfg: CodecConfig, mesh) -> list[bytes]:
    """Encode one grayscale image tiled over the mesh sp axis.

    Returns the per-tile substreams (deterministic order: tile column 0..n).
    """
    sp = mesh.shape["sp"]
    h, w = img.shape
    assert w % sp == 0, "width must divide evenly into sp tiles"
    tile_cfg = CodecConfig(
        width=w // sp, height=h, quant=cfg.quant, transform=cfg.transform,
        levels=cfg.levels, input_depth=cfg.input_depth,
    )
    fn = build_tiled_encode(tile_cfg, mesh)
    x = jnp.asarray(img, jnp.int32)[None]  # B=1 requires a dp=1 mesh
    wA, tA, wB, tB = fn(x)
    streams = []
    for t in range(sp):
        streams.append(image_codec.words_to_bytes(wA[0, t], int(tA[0, t])))
        streams.append(image_codec.words_to_bytes(wB[0, t], int(tB[0, t])))
    return streams, tile_cfg


def decode_image_tiled(streams: list[bytes], cfg: CodecConfig,
                       tile_cfg: CodecConfig) -> np.ndarray:
    """Decode per-tile substreams and reassemble (host loop over tiles)."""
    sp = len(streams) // 2
    out = np.empty((cfg.height, cfg.width), np.int32)
    tw = tile_cfg.width
    for t in range(sp):
        out[:, t * tw : (t + 1) * tw] = image_codec.decode_plane_bytes(
            streams[2 * t], streams[2 * t + 1], tile_cfg, chroma=False
        )
    return out
