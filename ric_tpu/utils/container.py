"""RTP1 container format.

The reference writes magic "RUD2" + u16 dims + a packed 1-byte header
(ric.cpp:114-121,150-154) and a single serial mux stream. This container
carries the same logical fields in its own format plus what the parallel
design needs: 32-bit dims (no 65535 limit), per-channel substream byte
lengths so channels/tiles decode independently, corruption is localizable,
and streams stitch deterministically across a device mesh (SURVEY.md §5).

Two layouts share the magic: the FULL layout below (any size, tiling,
per-substream CRC table) and a SLIM layout for small untiled images
(marked by the version byte's top bit — see `SLIM`) that carries the same
logical fields in a 13-byte header with one whole-container CRC.

Full layout (little-endian):
  0   4s  magic "RTP1"
  4   u8  version (4)
  5   u8  flags: bit0 color, bits1-2 transform, bit3 16-bit depth
  6   u8  quant (0 = lossless)
  7   u8  levels
  8   u32 width
  12  u32 height
  16  u16 tiles_x, u16 tiles_y  (1,1 = untiled)
  20  u8  lanes: 0 = auto, else log2(lane count)+1 (speed/rate knob)
  21  3x u8 reserved
  24  u32 x nstreams  byte length of each substream
  then u32 x nstreams per-substream CRC32s, a u32 CRC32 of everything
  above (header self-check — a flipped dim/quant byte must not silently
  decode as a different config), then the substreams, each padded to a
  4-byte boundary.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ric_tpu.config import CodecConfig, Transform

MAGIC = b"RTP1"
# v5: round-5 final bitstream (optional container integrity, lanes byte
# only when explicitly set, quant-aware bucket-3 lane budget). Bumped so
# earlier containers are rejected by the version check instead of
# silently misdecoding (per-substream CRCs cover bytes, not semantics).
VERSION = 5

# Slim layout marker: version byte's top bit. Small untiled images write
# an 18 B (gray) / 26 B (color) header+integrity envelope — 14/22 B with
# integrity off — instead of the full 44/76 B one. At 512^2 corpus rates
# the full envelope alone was ~1% of the container (tools/rate_audit.py),
# against the reference's 9 B header, which ships no integrity at all
# (ric.cpp:114-121); `check=False` matches that envelope for rate
# comparisons while the default keeps the whole-container CRC.
# Layout (little-endian):
#   0   4s  magic "RTP1"
#   4   u8  0x80 | version
#   5   u8  flags (bits 0-4,7 as the full layout; bit 5 = container CRC
#             present; bit 6 = explicit lanes byte present)
#   6   u8  quant
#   7   u8  levels
#   8   u16 width, u16 height
#   12  u8  lanes (ONLY if flags bit 6; auto-derived lane counts ship
#             nothing — _lanes(cfg) is a pure function of the header)
#   then u16 x (nstreams-1)  byte length of each substream but the last
#             (the last is implied by the container length)
#   then (if flags bit 5) u32 CRC32 over every other byte of the
#   container (header, length table, and all substream bytes — one
#   whole-container check instead of the full layout's per-substream
#   table), then the substreams, unpadded.
SLIM = 0x80


class BadMagic(ValueError):
    pass


class CorruptStream(ValueError):
    """A substream failed its CRC; the index localizes the damage."""


def write_container(cfg: CodecConfig, streams: list[bytes],
                    tiles: tuple[int, int] = (1, 1),
                    archival: bool = False, mode2: bool = False,
                    dct: bool = False, check: bool = True) -> bytes:
    """`check=False` drops the slim layout's container CRC (4 B) — the
    envelope the reference format ships (none). Full-layout containers
    (big/tiled streams) always carry their CRC table; 36+ B is noise
    there and corruption localization is the point."""
    flags = (1 if cfg.channels == 3 else 0)
    flags |= (int(cfg.transform) & 3) << 1
    flags |= (1 if cfg.input_depth == 16 else 0) << 3
    flags |= (1 if archival else 0) << 4
    flags |= (1 if mode2 else 0) << 6  # global-DWT (mode-2) tile grid
    flags |= (1 if dct else 0) << 7  # lapped-binDCT coding profile
    from ric_tpu.utils.native import crc32

    if (tiles == (1, 1) and not mode2 and cfg.width < 0x10000
            and cfg.height < 0x10000
            and all(len(s) < 0x10000 for s in streams)):
        if check:
            flags |= 1 << 5  # container CRC present
        lanes_b = cfg.lanes_log2 + 1 if cfg.lanes_log2 >= 0 else 0
        if lanes_b:
            flags |= 1 << 6  # explicit lanes byte present
        head = struct.pack(
            "<4sBBBBHH", MAGIC, SLIM | VERSION, flags, cfg.quant,
            cfg.levels, cfg.width, cfg.height)
        if lanes_b:
            head += struct.pack("<B", lanes_b)
        lens = struct.pack(
            f"<{len(streams) - 1}H", *[len(s) for s in streams[:-1]])
        body = b"".join(streams)
        if not check:
            return head + lens + body
        crc = struct.pack("<I", crc32(head + lens + body))
        return head + lens + crc + body
    flags |= 1 << 5  # full layout: per-substream CRC32 table present
    head = struct.pack(
        "<4sBBBBIIHHBBBB",
        MAGIC, VERSION, flags, cfg.quant, cfg.levels,
        cfg.width, cfg.height, tiles[0], tiles[1],
        cfg.lanes_log2 + 1 if cfg.lanes_log2 >= 0 else 0, 0, 0, 0,
    )
    lens = struct.pack(f"<{len(streams)}I", *[len(s) for s in streams])
    from ric_tpu.utils.native import crc32

    crcs = struct.pack(f"<{len(streams)}I", *[crc32(s) for s in streams])
    hcrc = struct.pack("<I", crc32(head + lens + crcs))
    # pad for 4-byte alignment of the NEXT stream; the final one needs no
    # tail pad (uncovered pad bytes would make 1-byte truncations silently
    # survive the CRC check)
    body = b"".join(
        s + b"\x00" * (0 if i == len(streams) - 1 else (-len(s)) % 4)
        for i, s in enumerate(streams))
    return head + lens + crcs + hcrc + body


def read_container(data: bytes):
    """Returns (cfg, streams, tiles, archival, mode2, dct)."""
    if data[:4] != MAGIC:
        raise BadMagic("bad magic (expected RTP1)")
    if data[4] & SLIM:
        return _read_slim(data)
    (_, version, flags, quant, levels, width, height, tx, ty,
     lanes_b, _r0, _r1, _r2) = struct.unpack("<4sBBBBIIHHBBBB", data[:24])
    if version != VERSION:
        raise ValueError(f"unsupported version {version}")
    channels = 3 if (flags & 1) else 1
    cfg = CodecConfig(
        width=width, height=height, channels=channels, quant=quant,
        transform=Transform((flags >> 1) & 3), levels=levels,
        input_depth=16 if (flags >> 3) & 1 else 8,
        lanes_log2=lanes_b - 1 if lanes_b else -1,
    )
    # two substreams per plane per tile: raw bits (A) + rANS (B)
    nstreams = channels * 2 * tx * ty
    off = 24
    lens = struct.unpack(f"<{nstreams}I", data[off : off + 4 * nstreams])
    off += 4 * nstreams
    crcs = None
    if (flags >> 5) & 1:
        crcs = struct.unpack(f"<{nstreams}I", data[off : off + 4 * nstreams])
        off += 4 * nstreams
        from ric_tpu.utils.native import crc32

        (hcrc,) = struct.unpack("<I", data[off : off + 4])
        if crc32(data[:off]) != hcrc:
            raise CorruptStream("header CRC mismatch")
        off += 4
    streams = []
    for i, ln in enumerate(lens):
        s = data[off : off + ln]
        if crcs is not None:
            from ric_tpu.utils.native import crc32

            if crc32(s) != crcs[i]:
                raise CorruptStream(
                    f"substream {i} CRC mismatch (corruption localized to "
                    f"plane/tile {i // 2})"
                )
        streams.append(s)
        off += ln + ((-ln) % 4)
    mode2 = bool((flags >> 6) & 1)
    dctp = bool((flags >> 7) & 1)
    return cfg, streams, (tx, ty), bool((flags >> 4) & 1), mode2, dctp


def _read_slim(data: bytes):
    (_, vb, flags, quant, levels, width,
     height) = struct.unpack("<4sBBBBHH", data[:12])
    if (vb & ~SLIM) != VERSION:
        raise ValueError(f"unsupported version {vb & ~SLIM}")
    off = 12
    lanes_b = 0
    if (flags >> 6) & 1:
        lanes_b = data[off]
        off += 1
    channels = 3 if (flags & 1) else 1
    cfg = CodecConfig(
        width=width, height=height, channels=channels, quant=quant,
        transform=Transform((flags >> 1) & 3), levels=levels,
        input_depth=16 if (flags >> 3) & 1 else 8,
        lanes_log2=lanes_b - 1 if lanes_b else -1,
    )
    nstreams = channels * 2
    lens = struct.unpack(
        f"<{nstreams - 1}H", data[off : off + 2 * (nstreams - 1)])
    off += 2 * (nstreams - 1)
    if (flags >> 5) & 1:
        from ric_tpu.utils.native import crc32

        (crc,) = struct.unpack("<I", data[off : off + 4])
        if crc32(data[: off] + data[off + 4 :]) != crc:
            raise CorruptStream("container CRC mismatch")
        off += 4
    last = len(data) - off - sum(lens)
    if last < 0:
        raise CorruptStream("container truncated (length table overruns)")
    streams = []
    for ln in lens + (last,):
        streams.append(data[off : off + ln])
        off += ln
    return (cfg, streams, (1, 1), bool((flags >> 4) & 1), False,
            bool((flags >> 7) & 1))
