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
from jax import shard_map

from ric_tpu.config import CodecConfig
from ric_tpu.models import image_codec
from ric_tpu.models import tables as tbl_mod


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


def decode_container_tiled(cfg: CodecConfig, streams: list[bytes],
                           tiles: tuple[int, int]) -> np.ndarray:
    """Decode a mode-1 tiled container (independent per-tile codecs) read
    back from container.read_container. Stream order is raster over the
    (ty, tx) tile grid, channels-in-tile, two substreams per plane."""
    import dataclasses

    tx, ty = tiles
    if cfg.width % tx or cfg.height % ty:
        raise ValueError(f"tiled container dims {cfg.width}x{cfg.height} "
                         f"not divisible by tile grid {tx}x{ty}")
    tcfg = dataclasses.replace(
        cfg, width=cfg.width // tx, height=cfg.height // ty
    )
    per_tile = cfg.channels * 2
    shape = (
        (cfg.height, cfg.width)
        if cfg.channels == 1
        else (cfg.height, cfg.width, 3)
    )
    out = np.empty(shape, np.int32)
    for j in range(ty):
        for i in range(tx):
            sub = streams[(j * tx + i) * per_tile :][:per_tile]
            tile = image_codec.decode_plane_streams(sub, tcfg)
            out[
                j * tcfg.height : (j + 1) * tcfg.height,
                i * tcfg.width : (i + 1) * tcfg.width,
            ] = tile
    return out


# --------------------------------------------------------------------------
# Mode 2: globally-consistent DWT (ppermute halos) + per-tile entropy.
# Decoded pixels are bit-identical to the untiled codec; only the stream
# layout differs (per-tile substreams).
# --------------------------------------------------------------------------


def make_tile_plans(cfg: CodecConfig, chroma: bool, sp: int):
    """Per-tile band plans under the GLOBAL level recursion: every band's
    tile slice must align to whole 4-px blocks."""
    plans_g, dims = image_codec.make_plane_plans(cfg, chroma)
    plans = []
    for p in plans_g:
        h, w = p.shape
        assert w % sp == 0 and (w // sp) % 4 == 0, (
            f"band {p.name}: width {w} not tileable by {sp}"
        )
        shape = (h, w // sp)
        plans.append(
            image_codec.BandPlan(
                p.name, p.orient, p.level, p.kind, shape,
                image_codec._grid(shape), p.q, p.rd, p.wmax,
            )
        )
    return plans, dims


def _tile_cfg(cfg: CodecConfig, sp: int) -> CodecConfig:
    import dataclasses

    return dataclasses.replace(cfg, width=cfg.width // sp)


def build_tiled_encode_global(cfg: CodecConfig, mesh):
    """Returns jitted fn: (H, W) int32 -> (wordsA (sp, capA), tA (sp,),
    wordsB (sp, capB), tB (sp,)). Global-DWT mode."""
    sp = mesh.shape["sp"]
    plans, dims = make_tile_plans(cfg, False, sp)
    tcfg = _tile_cfg(cfg, sp)
    L = image_codec._lanes(tcfg)
    capA = image_codec._cap_words_a(tcfg)
    cap16 = image_codec._cap_words16(plans, L)
    image_tables = image_codec._use_image_tables(tcfg)
    static_tables = tbl_mod.get_dense_tables(tbl_mod.rate_bucket(cfg.quant))
    from ric_tpu.parallel import halo_dwt
    from ric_tpu.config import Transform

    def local(xt):
        pyr = halo_dwt.dwt_tiled(
            xt, Transform(cfg.transform), cfg.levels, cfg.width, "sp"
        )
        payload = image_codec._payload_from_pyramid(plans, pyr)
        wA, tA, wB, tB = image_codec._payload_to_streams(
            plans, L, capA, cap16, image_tables, static_tables, payload)
        return wA[None], tA[None], wB[None], tB[None]

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(None, "sp"),),
        out_specs=(P("sp", None), P("sp"), P("sp", None), P("sp")),
    )
    return jax.jit(fn)


def encode_image_tiled_global(img, cfg: CodecConfig, mesh):
    """Global-DWT tiled encode of one plane. Returns per-tile substreams
    [A0, B0, A1, B1, ...] in tile order (deterministic stitch)."""
    sp = mesh.shape["sp"]
    fn = build_tiled_encode_global(cfg, mesh)
    wA, tA, wB, tB = fn(jnp.asarray(img, jnp.int32))
    streams = []
    for t in range(sp):
        streams.append(image_codec.words_to_bytes(wA[t], int(tA[t])))
        streams.append(image_codec.words_to_bytes(wB[t], int(tB[t])))
    return streams


def build_tiled_decode_global(cfg: CodecConfig, mesh):
    sp = mesh.shape["sp"]
    plans, dims = make_tile_plans(cfg, False, sp)
    tcfg = _tile_cfg(cfg, sp)
    L = image_codec._lanes(tcfg)
    nlev = len(dims)
    image_tables = image_codec._use_image_tables(tcfg)
    static_tables = tbl_mod.get_dense_tables(tbl_mod.rate_bucket(cfg.quant))
    from ric_tpu.parallel import halo_dwt
    from ric_tpu.config import Transform

    def local(wordsA, statesB, stream16):
        wordsA, statesB, stream16 = wordsA[0], statesB[0], stream16[0]
        coeffs = image_codec._streams_to_coeffs(
            plans, L, nlev, image_tables, static_tables,
            wordsA, statesB, stream16)
        pyr = image_codec._pyramid_from_coeffs(coeffs, nlev)
        return halo_dwt.idwt_tiled(
            pyr, cfg.width, cfg.height, Transform(cfg.transform), "sp"
        )

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("sp", None), P("sp", None), P("sp", None)),
        out_specs=P(None, "sp"),
    )
    return jax.jit(fn)


def decode_image_tiled_global(streams, cfg: CodecConfig, mesh):
    sp = mesh.shape["sp"]
    plans, _ = make_tile_plans(cfg, False, sp)
    tcfg = _tile_cfg(cfg, sp)
    L = image_codec._lanes(tcfg)
    capA = image_codec._cap_words_a(tcfg)
    cap16 = image_codec._cap_words16(plans, L) + L + 8
    wA = np.zeros((sp, capA), np.uint32)
    states = np.zeros((sp, L), np.uint32)
    s16 = np.zeros((sp, cap16), np.uint32)
    for t in range(sp):
        a, b = streams[2 * t], streams[2 * t + 1]
        bufA = np.frombuffer(a + b"\x00" * ((-len(a)) % 4), dtype="<u4")
        wA[t, : min(len(bufA), capA)] = bufA[:capA]
        b32 = np.frombuffer(
            b[: 4 * L] + b"\x00" * max(4 * L - len(b), 0), "<u4")
        states[t] = b32[:L]
        body = np.frombuffer(
            b[4 * L :] + b"\x00" * ((-(len(b) - 4 * L)) % 2), "<u2")
        s16[t, : len(body)] = body
    fn = build_tiled_decode_global(cfg, mesh)
    out = fn(jnp.asarray(wA), jnp.asarray(states), jnp.asarray(s16))
    return np.asarray(out)
