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

    Any width is accepted: when W doesn't divide by sp the image is
    edge-replicate padded to sp equal columns (tile dims may be odd — each
    tile is a full independent codec, which handles arbitrary dims the way
    the reference handles any WxH, wavelet2d.cpp:73-79); the decoder crops
    the padding away. Returns the per-tile substreams (deterministic order:
    tile column 0..n).
    """
    sp = mesh.shape["sp"]
    h, w = img.shape
    tw = -(-w // sp)
    if w != sp * tw:
        img = np.pad(img, ((0, 0), (0, sp * tw - w)), mode="edge")
    tile_cfg = CodecConfig(
        width=tw, height=h, quant=cfg.quant, transform=cfg.transform,
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
    """Decode per-tile substreams and reassemble (host loop over tiles),
    cropping any encoder-side padding to cfg dims."""
    sp = len(streams) // 2
    tw = tile_cfg.width
    out = np.empty((cfg.height, sp * tw), np.int32)
    for t in range(sp):
        out[:, t * tw : (t + 1) * tw] = image_codec.decode_plane_bytes(
            streams[2 * t], streams[2 * t + 1], tile_cfg, chroma=False
        )
    return out[:, : cfg.width]


def decode_container_tiled(cfg: CodecConfig, streams: list[bytes],
                           tiles: tuple[int, int]) -> np.ndarray:
    """Decode a mode-1 tiled container (independent per-tile codecs) read
    back from container.read_container. Stream order is raster over the
    (ty, tx) tile grid, channels-in-tile, two substreams per plane. Tile
    dims are ceil(W/tx) x ceil(H/ty); encoder-side edge padding (when the
    grid doesn't divide the image) is cropped away."""
    import dataclasses

    tx, ty = tiles
    tw, th = -(-cfg.width // tx), -(-cfg.height // ty)
    tcfg = dataclasses.replace(cfg, width=tw, height=th)
    per_tile = cfg.channels * 2
    shape = (
        (ty * th, tx * tw) if cfg.channels == 1 else (ty * th, tx * tw, 3)
    )
    out = np.empty(shape, np.int32)
    for j in range(ty):
        for i in range(tx):
            sub = streams[(j * tx + i) * per_tile :][:per_tile]
            tile = image_codec.decode_plane_streams(sub, tcfg)
            out[j * th : (j + 1) * th, i * tw : (i + 1) * tw] = tile
    return out[: cfg.height, : cfg.width]


def build_tiled_encode_planes(tile_cfg: CodecConfig, mesh, channels: int):
    """Mode-1 multi-plane tiled encoder: (C, H, sp*tw) int32 working-domain
    planes (Y[, Cg, Co]) -> per-tile stream stacks
    (wA (sp, C, capA), tA (sp, C), wB (sp, C, capB), tB (sp, C))."""
    enc_y = image_codec.build_encode_plane(tile_cfg, chroma=False)
    enc_c = (
        image_codec.build_encode_plane(tile_cfg, chroma=True)
        if channels == 3 else None
    )

    def local(xt):
        outs = [enc_y(xt[0])]
        if channels == 3:
            outs.append(enc_c(xt[1]))
            outs.append(enc_c(xt[2]))
        wA = jnp.stack([o[0] for o in outs])
        tA = jnp.stack([o[1] for o in outs])
        wB = jnp.stack([o[2] for o in outs])
        tB = jnp.stack([o[3] for o in outs])
        return wA[None], tA[None], wB[None], tB[None]

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(None, None, "sp"),),
        out_specs=(P("sp", None, None), P("sp", None),
                   P("sp", None, None), P("sp", None)),
    )
    return jax.jit(fn)


def encode_image_tiled_container(img: np.ndarray, cfg: CodecConfig,
                                 mesh) -> bytes:
    """Mode-1 tiled encode of a raw uint8/uint16 image ((H, W) gray or
    (H, W, 3) RGB, 8- or 16-bit per cfg.input_depth) into an RTP1 container
    with tiles=(sp, 1). Arbitrary widths: edge padding, cropped on decode
    (decode_container_tiled). decode_image routes the container back here."""
    import dataclasses

    sp = mesh.shape["sp"]
    img = np.asarray(img)
    h, w = img.shape[:2]
    tw = -(-w // sp)
    if sp * tw != w:
        pad = ((0, 0), (0, sp * tw - w)) + ((0, 0),) * (img.ndim - 2)
        img = np.pad(img, pad, mode="edge")
    x32 = jnp.asarray(img).astype(jnp.int32)
    from ric_tpu.config import SHIFT

    if cfg.channels == 3:
        y, co, cg = image_codec.rgb_to_ycocg(
            x32, 0 if cfg.lossless else SHIFT)
        x = jnp.stack([y, cg, co])
    else:
        mid = 1 << (cfg.input_depth - 1)
        if cfg.lossless or cfg.input_depth != 8:
            x = (x32 - mid)[None]
        else:
            x = ((x32 - mid) << SHIFT)[None]
    tile_cfg = dataclasses.replace(cfg, width=tw, height=h)
    fn = build_tiled_encode_planes(tile_cfg, mesh, cfg.channels)
    wA, tA, wB, tB = fn(x)
    streams = []
    for t in range(sp):
        for c in range(cfg.channels):
            streams.append(image_codec.words_to_bytes(wA[t, c], int(tA[t, c])))
            streams.append(image_codec.words_to_bytes(wB[t, c], int(tB[t, c])))
    from ric_tpu.utils import container

    return container.write_container(cfg, streams, tiles=(sp, 1))


# --------------------------------------------------------------------------
# Mode 2: globally-consistent DWT (ppermute halos) + per-tile entropy.
# Decoded pixels are bit-identical to the untiled codec; only the stream
# layout differs (per-tile substreams).
# --------------------------------------------------------------------------


def make_tile_plans(cfg: CodecConfig, chroma: bool, sp: int, spy: int = 1):
    """Per-tile band plans under the GLOBAL level recursion: every band's
    tile slice must align to whole 4-px blocks (both grid axes)."""
    plans_g, dims = image_codec.make_plane_plans(cfg, chroma)
    plans = []
    for p in plans_g:
        h, w = p.shape
        assert w % sp == 0 and (w // sp) % 4 == 0, (
            f"band {p.name}: width {w} not tileable by {sp}"
        )
        assert h % spy == 0 and (spy == 1 or (h // spy) % 4 == 0), (
            f"band {p.name}: height {h} not tileable by {spy}"
        )
        shape = (h // spy, w // sp)
        plans.append(
            image_codec.BandPlan(
                p.name, p.orient, p.level, p.kind, shape,
                image_codec._grid(shape), p.q, p.rd, p.wmax,
            )
        )
    return plans, dims


def _tile_cfg(cfg: CodecConfig, sp: int, spy: int = 1) -> CodecConfig:
    import dataclasses

    return dataclasses.replace(
        cfg, width=cfg.width // sp, height=cfg.height // spy
    )


def grid_pad_multiple(levels: int, tiles: int) -> int:
    """Axis-length multiple that keeps every level of the global recursion
    (halving `levels` times, wavelet2d.cpp:73-79) evenly splittable into
    `tiles` tile slices of whole 4-px blocks."""
    return tiles * 4 * (1 << levels)


def pad_for_grid(img: np.ndarray, cfg: CodecConfig, spx: int, spy: int):
    """Edge-replicate pad an (H, W) plane so the (spy, spx) global-DWT grid
    divides cleanly at every level. Returns (padded, padded_cfg); decode
    crops back to cfg dims. Lossless round-trips are unaffected; lossy
    reconstructions may differ from untiled only within the transform's
    support of the padded border."""
    import dataclasses

    my = grid_pad_multiple(cfg.levels, spy)
    mx = grid_pad_multiple(cfg.levels, spx)
    h, w = img.shape[-2:]
    hp, wp = -(-h // my) * my, -(-w // mx) * mx
    if (hp, wp) != (h, w):
        img = np.pad(img, ((0, hp - h), (0, wp - w)), mode="edge")
    return img, dataclasses.replace(cfg, width=wp, height=hp)


def build_tiled_encode_global(cfg: CodecConfig, mesh, chroma: bool = False):
    """Returns jitted fn: (H, W) int32 -> per-tile streams. 1-D sp mesh:
    (wordsA (sp, capA), tA (sp,), wordsB (sp, capB), tB (sp,)); a mesh with
    a 'spy' axis tiles both image axes and the leading stream dim becomes
    (spy, sp). Global-DWT mode (decode bit-identical to untiled)."""
    sp = mesh.shape["sp"]
    spy = dict(mesh.shape).get("spy", 1)
    grid = spy > 1
    plans, dims = make_tile_plans(cfg, chroma, sp, spy)
    tcfg = _tile_cfg(cfg, sp, spy)
    L = image_codec._lanes(tcfg)
    capA = image_codec._cap_words_a(tcfg)
    cap16 = image_codec._cap_words16(plans, L)
    image_tables = image_codec._use_image_tables(tcfg)
    tctx = tbl_mod.get_table_ctx(image_codec._table_bucket(tcfg), chroma)
    packed = image_codec._packed_mode(tcfg)
    from ric_tpu.parallel import halo_dwt
    from ric_tpu.config import Transform

    def local(xt):
        pyr = halo_dwt.dwt_tiled(
            xt, Transform(cfg.transform), cfg.levels, cfg.width, "sp",
            global_height=cfg.height, ax_y="spy" if grid else None,
        )
        payload = image_codec._payload_from_pyramid(plans, pyr)
        wA, tA, wB, tB = image_codec._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            packed=packed)
        if grid:
            return (wA[None, None], tA[None, None],
                    wB[None, None], tB[None, None])
        return wA[None], tA[None], wB[None], tB[None]

    if grid:
        fn = shard_map(
            local, mesh=mesh, in_specs=(P("spy", "sp"),),
            out_specs=(P("spy", "sp", None), P("spy", "sp"),
                       P("spy", "sp", None), P("spy", "sp")),
        )
    else:
        fn = shard_map(
            local, mesh=mesh, in_specs=(P(None, "sp"),),
            out_specs=(P("sp", None), P("sp"), P("sp", None), P("sp")),
        )
    return jax.jit(fn)


def encode_image_tiled_global(img, cfg: CodecConfig, mesh):
    """Global-DWT tiled encode of one plane. Returns per-tile substreams
    [A0, B0, A1, B1, ...] in raster tile order (deterministic stitch)."""
    sp = mesh.shape["sp"]
    spy = dict(mesh.shape).get("spy", 1)
    fn = build_tiled_encode_global(cfg, mesh)
    wA, tA, wB, tB = fn(jnp.asarray(img, jnp.int32))
    if spy > 1:
        wA = wA.reshape(spy * sp, -1)
        wB = wB.reshape(spy * sp, -1)
        tA, tB = tA.reshape(-1), tB.reshape(-1)
    streams = []
    for t in range(spy * sp):
        streams.append(image_codec.words_to_bytes(wA[t], int(tA[t])))
        streams.append(image_codec.words_to_bytes(wB[t], int(tB[t])))
    return streams


def build_tiled_decode_global(cfg: CodecConfig, mesh, chroma: bool = False):
    sp = mesh.shape["sp"]
    spy = dict(mesh.shape).get("spy", 1)
    grid = spy > 1
    plans, dims = make_tile_plans(cfg, chroma, sp, spy)
    tcfg = _tile_cfg(cfg, sp, spy)
    L = image_codec._lanes(tcfg)
    nlev = len(dims)
    image_tables = image_codec._use_image_tables(tcfg)
    tctx = tbl_mod.get_table_ctx(image_codec._table_bucket(tcfg), chroma)
    from ric_tpu.parallel import halo_dwt
    from ric_tpu.config import Transform

    sparse = image_codec._sparse_decode(tcfg)

    def local(wordsA, statesB, stream16):
        take = (lambda a: a[0, 0]) if grid else (lambda a: a[0])
        wordsA, statesB, stream16 = (
            take(wordsA), take(statesB), take(stream16))
        coeffs = image_codec._streams_to_coeffs(
            plans, L, nlev, image_tables, tctx,
            wordsA, statesB, stream16, sparse=sparse, packed=image_codec._packed_mode(tcfg))
        pyr = image_codec._pyramid_from_coeffs(coeffs, nlev)
        return halo_dwt.idwt_tiled(
            pyr, cfg.width, cfg.height, Transform(cfg.transform), "sp",
            ax_y="spy" if grid else None,
        )

    if grid:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("spy", "sp", None),) * 3,
            out_specs=P("spy", "sp"),
        )
    else:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("sp", None), P("sp", None), P("sp", None)),
            out_specs=P(None, "sp"),
        )
    return jax.jit(fn)


def decode_image_tiled_global(streams, cfg: CodecConfig, mesh):
    sp = mesh.shape["sp"]
    spy = dict(mesh.shape).get("spy", 1)
    plans, _ = make_tile_plans(cfg, False, sp, spy)
    tcfg = _tile_cfg(cfg, sp, spy)
    L = image_codec._lanes(tcfg)
    capA = image_codec._cap_words_a(tcfg)
    cap16 = image_codec._cap_words16(plans, L) + L + 8
    nt = spy * sp
    wA = np.zeros((nt, capA), np.uint32)
    states = np.zeros((nt, L), np.uint32)
    s16 = np.zeros((nt, cap16), np.uint32)
    for t in range(nt):
        a, b = streams[2 * t], streams[2 * t + 1]
        bufA = np.frombuffer(a + b"\x00" * ((-len(a)) % 4), dtype="<u4")
        wA[t, : min(len(bufA), capA)] = bufA[:capA]
        b32 = np.frombuffer(
            b[: 4 * L] + b"\x00" * max(4 * L - len(b), 0), "<u4")
        states[t] = b32[:L]
        body = np.frombuffer(
            b[4 * L :] + b"\x00" * ((-(len(b) - 4 * L)) % 2), "<u2")
        s16[t, : len(body)] = body
    if spy > 1:
        wA = wA.reshape(spy, sp, -1)
        states = states.reshape(spy, sp, -1)
        s16 = s16.reshape(spy, sp, -1)
    fn = build_tiled_decode_global(cfg, mesh)
    out = fn(jnp.asarray(wA), jnp.asarray(states), jnp.asarray(s16))
    return np.asarray(out)


def encode_image_tiled_global_any(img, cfg: CodecConfig, mesh):
    """Mode-2 encode of an arbitrary-size plane: pads internally to the
    grid-divisible dims (pad_for_grid) and encodes the padded plane.
    Returns (streams, padded_cfg); pass both to
    decode_image_tiled_global_any to get the original dims back."""
    spy = dict(mesh.shape).get("spy", 1)
    img = np.asarray(img)
    padded, pcfg = pad_for_grid(img, cfg, mesh.shape["sp"], spy)
    return encode_image_tiled_global(padded, pcfg, mesh), pcfg


def decode_image_tiled_global_any(streams, cfg: CodecConfig,
                                  pcfg: CodecConfig, mesh):
    out = decode_image_tiled_global(streams, pcfg, mesh)
    return out[: cfg.height, : cfg.width]


# --------------------------------------------------------------------------
# Mode-2 PRODUCT SURFACE: RTP1 containers with the global-DWT tile grid
# (flags bit 6). Encode works on a device mesh (halo-exchange DWT) or a
# single device (global DWT + per-tile entropy, shared per-tile graph);
# decode needs NO mesh — per-tile coefficients decode independently, the
# global band arrays are stitched, and one untiled inverse DWT finishes.
# Streams are identical either way (the DWT is global by construction),
# so a container encoded on an 8-chip mesh decodes bit-identically on one.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _tile_coeff_encoder(cfg: CodecConfig, chroma: bool, tx: int, ty: int):
    """Shared jit: one tile's band-slice pyramid -> (wA, tA, wB, tB)."""
    plans, dims = make_tile_plans(cfg, chroma, tx, ty)
    tcfg = _tile_cfg(cfg, tx, ty)
    L = image_codec._lanes(tcfg)
    capA = image_codec._cap_words_a(tcfg)
    cap16 = image_codec._cap_words16(plans, L)
    image_tables = image_codec._use_image_tables(tcfg)
    tctx = tbl_mod.get_table_ctx(image_codec._table_bucket(tcfg), chroma)

    packed = image_codec._packed_mode(tcfg)

    def enc(pyr_tile):
        payload = image_codec._payload_from_pyramid(plans, pyr_tile)
        return image_codec._payload_to_streams(
            plans, L, capA, cap16, image_tables, tctx, payload,
            packed=packed)

    return jax.jit(enc)


@functools.lru_cache(maxsize=16)
def _tile_coeff_decoder(cfg: CodecConfig, chroma: bool, tx: int, ty: int):
    """Shared jit: one tile's streams -> band coeff arrays (plan order)."""
    plans, dims = make_tile_plans(cfg, chroma, tx, ty)
    tcfg = _tile_cfg(cfg, tx, ty)
    L = image_codec._lanes(tcfg)
    nlev = len(dims)
    image_tables = image_codec._use_image_tables(tcfg)
    tctx = tbl_mod.get_table_ctx(image_codec._table_bucket(tcfg), chroma)
    sparse = image_codec._sparse_decode(tcfg)
    names = [p.name for p in plans]

    def dec(wordsA, states, stream16):
        coeffs = image_codec._streams_to_coeffs(
            plans, L, nlev, image_tables, tctx,
            wordsA, states, stream16, sparse=sparse, packed=image_codec._packed_mode(tcfg))
        return tuple(coeffs[n] for n in names)

    return jax.jit(dec), names, plans, L


@functools.lru_cache(maxsize=16)
def _cached_dwt(transform, levels):
    from ric_tpu.config import Transform
    from ric_tpu.ops import lifting

    return jax.jit(
        lambda x: lifting.dwt(x, Transform(transform), levels))


@functools.lru_cache(maxsize=16)
def _cached_idwt(transform, width, height):
    from ric_tpu.config import Transform
    from ric_tpu.ops import lifting

    return jax.jit(
        lambda p: lifting.idwt(p, width, height, Transform(transform)))


def _encode_plane_mode2(plane, pcfg: CodecConfig, chroma: bool,
                        tx: int, ty: int):
    """Single-device mode-2 plane encode: global DWT once, then the shared
    per-tile entropy graph over the (ty, tx) grid. Returns per-tile
    [A, B] byte substreams in raster tile order."""
    pyr = _cached_dwt(pcfg.transform, pcfg.levels)(
        jnp.asarray(plane, jnp.int32))
    enc = _tile_coeff_encoder(pcfg, chroma, tx, ty)
    streams = []
    for j in range(ty):
        for i in range(tx):
            tile_pyr = []
            for lvl_entry in pyr:
                sl = {}
                for o, band in lvl_entry.items():
                    h, w = band.shape
                    th, tw = h // ty, w // tx
                    sl[o] = jax.lax.dynamic_slice(
                        band, (j * th, i * tw), (th, tw))
                tile_pyr.append(sl)
            wA, tA, wB, tB = enc(tile_pyr)
            streams.append(image_codec.words_to_bytes(wA, int(tA)))
            streams.append(image_codec.words_to_bytes(wB, int(tB)))
    return streams


def _decode_plane_mode2(streams, pcfg: CodecConfig, chroma: bool,
                        tx: int, ty: int) -> np.ndarray:
    """Mesh-free mode-2 plane decode: per-tile coeffs via the shared jit,
    global band stitch, one untiled inverse DWT."""
    dec, names, plans, L = _tile_coeff_decoder(pcfg, chroma, tx, ty)
    capA = image_codec._cap_words_a(_tile_cfg(pcfg, tx, ty))
    cap16 = image_codec._cap_words16(plans, L) + L + 8
    per_tile = []
    for t in range(tx * ty):
        a, b = streams[2 * t], streams[2 * t + 1]
        bufA = np.frombuffer(a + b"\x00" * ((-len(a)) % 4), dtype="<u4")
        wA = np.zeros(capA, np.uint32)
        wA[: min(len(bufA), capA)] = bufA[:capA]
        b32 = np.frombuffer(
            b[: 4 * L] + b"\x00" * max(4 * L - len(b), 0), "<u4")
        states = b32[:L].astype(np.uint32)
        w16 = np.frombuffer(
            b[4 * L :] + b"\x00" * ((-(len(b) - 4 * L)) % 2), "<u2")
        s16 = np.zeros(cap16, np.uint32)
        s16[: min(len(w16), cap16)] = w16[:cap16]
        per_tile.append(dec(
            jnp.asarray(wA), jnp.asarray(states), jnp.asarray(s16)))
    # stitch global bands: per name, tiles in raster order
    gplans, dims = image_codec.make_plane_plans(pcfg, chroma)
    nlev = len(dims)
    coeffs = {}
    for idx, name in enumerate(names):
        rows = []
        for j in range(ty):
            rows.append(jnp.concatenate(
                [per_tile[j * tx + i][idx] for i in range(tx)], axis=1))
        coeffs[name] = jnp.concatenate(rows, axis=0)
    pyr = image_codec._pyramid_from_coeffs(coeffs, nlev)
    out = _cached_idwt(pcfg.transform, pcfg.width, pcfg.height)(pyr)
    return np.asarray(out)


def encode_image_tiled_global_container(img: np.ndarray, cfg: CodecConfig,
                                        tiles: tuple[int, int],
                                        mesh=None) -> bytes:
    """Mode-2 tiled encode of a raw uint8/uint16 image ((H, W) gray or
    (H, W, 3) RGB) into an RTP1 container with the global-DWT tile grid
    (container flags bit 6). Arbitrary dims: pad_for_grid edge padding,
    cropped on decode. With `mesh` (shape (spy?, sp) matching `tiles`)
    the DWT runs distributed with ppermute halos; without, a single
    device computes the global DWT and runs the shared per-tile entropy
    graph — streams are identical either way."""
    import dataclasses
    from ric_tpu.config import SHIFT

    tx, ty = tiles
    img = np.asarray(img)
    if mesh is not None:
        sp = mesh.shape["sp"]
        spy = dict(mesh.shape).get("spy", 1)
        assert (tx, ty) == (sp, spy), "mesh shape must match tile grid"
    x32 = jnp.asarray(img).astype(jnp.int32)
    if cfg.channels == 3:
        y, co, cg = image_codec.rgb_to_ycocg(x32, 0 if cfg.lossless else SHIFT)
        planes = [(y, False), (cg, True), (co, True)]
    else:
        mid = 1 << (cfg.input_depth - 1)
        if cfg.lossless or cfg.input_depth != 8:
            planes = [(x32 - mid, False)]
        else:
            planes = [((x32 - mid) << SHIFT, False)]
    padded0, pcfg = pad_for_grid(np.asarray(planes[0][0]), cfg, tx, ty)
    per_tile_streams = [[] for _ in range(tx * ty)]
    for plane, chroma in planes:
        pl = np.asarray(plane)
        pl, _ = pad_for_grid(pl, cfg, tx, ty)
        if mesh is not None:
            fn = build_tiled_encode_global(pcfg, mesh, chroma)
            wA, tA, wB, tB = fn(jnp.asarray(pl, jnp.int32))
            spy = dict(mesh.shape).get("spy", 1)
            if spy > 1:
                wA = wA.reshape(spy * tx, -1)
                wB = wB.reshape(spy * tx, -1)
                tA, tB = tA.reshape(-1), tB.reshape(-1)
            for t in range(tx * ty):
                per_tile_streams[t].append(
                    image_codec.words_to_bytes(wA[t], int(tA[t])))
                per_tile_streams[t].append(
                    image_codec.words_to_bytes(wB[t], int(tB[t])))
        else:
            sub = _encode_plane_mode2(pl, pcfg, chroma, tx, ty)
            for t in range(tx * ty):
                per_tile_streams[t].append(sub[2 * t])
                per_tile_streams[t].append(sub[2 * t + 1])
    streams = [s for tile in per_tile_streams for s in tile]
    from ric_tpu.utils import container

    return container.write_container(cfg, streams, tiles=tiles, mode2=True)


def decode_container_tiled_global(cfg: CodecConfig, streams: list[bytes],
                                  tiles: tuple[int, int]) -> np.ndarray:
    """Decode a mode-2 container on any topology (no mesh needed): the
    per-tile substreams decode independently, band arrays stitch globally,
    one untiled inverse DWT reconstructs. Stream order is tile-major with
    [A, B] per channel inside (Y, Cg, Co for color)."""
    from ric_tpu.config import SHIFT

    tx, ty = tiles
    _, pcfg = pad_for_grid(
        np.zeros((cfg.height, cfg.width), np.uint8), cfg, tx, ty)
    per_tile = tiles[0] * tiles[1]
    nch = cfg.channels

    def plane_sub(c):
        out = []
        for t in range(per_tile):
            base = t * nch * 2 + c * 2
            out.append(streams[base])
            out.append(streams[base + 1])
        return out

    if nch == 3:
        y = _decode_plane_mode2(plane_sub(0), pcfg, False, tx, ty)
        cgp = _decode_plane_mode2(plane_sub(1), pcfg, True, tx, ty)
        cop = _decode_plane_mode2(plane_sub(2), pcfg, True, tx, ty)
        rgb = image_codec.ycocg_to_rgb(
            jnp.asarray(y), jnp.asarray(cop), jnp.asarray(cgp),
            0 if cfg.lossless else SHIFT)
        out = np.asarray(rgb).astype(np.int32)
        return out[: cfg.height, : cfg.width]
    x = _decode_plane_mode2(plane_sub(0), pcfg, False, tx, ty)
    x = x[: cfg.height, : cfg.width]
    mid = 1 << (cfg.input_depth - 1)
    peak = (1 << cfg.input_depth) - 1
    if cfg.lossless:
        return (x + mid).astype(np.int32)
    if cfg.input_depth == 8:
        x = mid + ((x + (1 << (SHIFT - 1))) >> SHIFT)
    else:
        x = x + mid
    return np.clip(x, 0, peak).astype(np.int32)
