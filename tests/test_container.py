"""Container validation: magic, CRC corruption localization."""
import numpy as np
import pytest

from ric_tpu.config import CodecConfig
from ric_tpu.utils import container


def test_bad_magic():
    with pytest.raises(container.BadMagic):
        container.read_container(b"NOPE" + b"\x00" * 64)


def test_crc_roundtrip_and_corruption():
    # small untiled image -> slim layout, one whole-container CRC
    cfg = CodecConfig(width=16, height=16)
    streams = [b"hello world!", b"stream two bytes"]
    data = container.write_container(cfg, streams)
    assert len(data) == 18 + sum(len(s) for s in streams)
    cfg2, out, tiles, arch, _m2, _d = container.read_container(data)
    assert out == streams and not arch
    bad = bytearray(data)
    bad[-3] ^= 0xFF
    with pytest.raises(container.CorruptStream, match="container CRC"):
        container.read_container(bytes(bad))
    # integrity off: 4 B cheaper (the reference's bare envelope), and the
    # same corruption now decodes to garbage streams instead of raising —
    # the documented trade
    d2 = container.write_container(cfg, streams, check=False)
    assert len(d2) == 14 + sum(len(s) for s in streams)
    assert container.read_container(d2)[1] == streams


def test_full_layout_crc_localization():
    # dims past u16 force the full layout: per-substream CRC table
    cfg = CodecConfig(width=70000, height=16)
    streams = [b"hello world!", b"stream two bytes"]
    data = container.write_container(cfg, streams)
    cfg2, out, tiles, arch, _m2, _d = container.read_container(data)
    assert out == streams and cfg2.width == 70000
    bad = bytearray(data)
    bad[-3] ^= 0xFF
    with pytest.raises(container.CorruptStream, match="substream 1"):
        container.read_container(bytes(bad))


def test_slim_layout_big_stream_falls_back():
    # a substream past u16 bytes forces the full layout even untiled
    cfg = CodecConfig(width=16, height=16)
    streams = [b"x" * 70000, b"y"]
    data = container.write_container(cfg, streams)
    assert not (data[4] & container.SLIM)
    assert container.read_container(data)[1] == streams


def test_fuzz_truncation_and_corruption(rng):
    """Truncated or bit-flipped containers must raise clean errors, never
    return garbage pixels (VERDICT round-1 item 8 fuzz requirement)."""
    import struct

    from ric_tpu.config import Transform
    from ric_tpu.models import image_codec

    img = np.clip(
        128 + 40 * rng.standard_normal((32, 32)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=32, height=32, quant=0,
                      transform=Transform.CDF53, levels=2)
    data = image_codec.encode_image(img, cfg)
    clean = (container.BadMagic, container.CorruptStream, ValueError,
             struct.error, IndexError)
    # truncations at every prefix length class
    for cut in [0, 3, 7, 16, 19, len(data) // 2, len(data) - 1]:
        with pytest.raises(clean):
            out = image_codec.decode_image(data[:cut])
            # a decode that "succeeds" must still be the right pixels
            if not np.array_equal(out, img.astype(np.int32)):
                raise ValueError("garbage pixels from truncated stream")
    # random single-byte corruptions across the whole container
    for _ in range(24):
        pos = int(rng.integers(0, len(data)))
        bad = bytearray(data)
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            out = image_codec.decode_image(bytes(bad))
        except clean:
            continue
        # corruption in padding bytes can legitimately decode clean; the
        # pixels must then be exact
        np.testing.assert_array_equal(out, img.astype(np.int32))


def test_plane_too_large_guard():
    """16k x 16k single-tile encode exceeds the int32 stream ceiling and
    must be rejected with a pointer at the tiled paths."""
    from ric_tpu.config import Transform
    from ric_tpu.models import image_codec

    cfg = CodecConfig(width=16384, height=16384, quant=0,
                      transform=Transform.CDF53)
    with pytest.raises(image_codec.PlaneTooLarge, match="tiled"):
        image_codec.build_encode_plane(cfg, chroma=False)


def test_lanes_override_roundtrip(rng):
    """Explicit lane count is recorded in the container and honored by
    the decoder (speed/rate knob)."""
    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.models import image_codec

    img = np.clip(
        128 + 40 * rng.standard_normal((48, 64)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=64, height=48, quant=0,
                      transform=Transform.CDF53, levels=2, lanes_log2=8)
    data = image_codec.encode_image(img, cfg)
    cfg2 = container.read_container(data)[0]
    assert cfg2.lanes_log2 == 8
    out = image_codec.decode_image(data)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_v3_container_rejected():
    """Old-version containers must be rejected by the version check, not
    silently misdecoded (the v3->v4 bitstream change is semantic: lane
    floors, centroid nibbles — per-substream CRCs cover bytes, not
    semantics)."""
    import struct

    from ric_tpu.utils.native import crc32

    # slim layout stamped v3
    head = struct.pack("<4sBBBBHHB", b"RTP1", 0x80 | 3, 0, 0, 5, 16, 16, 0)
    lens = struct.pack("<H", 1)
    body = b"ab"
    crc = struct.pack("<I", crc32(head + lens + body))
    with pytest.raises(ValueError, match="unsupported version"):
        container.read_container(head + lens + crc + body)
    # full layout stamped v3
    headf = struct.pack(
        "<4sBBBBIIHHBBBB", b"RTP1", 3, 0, 0, 5, 16, 16, 1, 1, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="unsupported version"):
        container.read_container(headf + struct.pack("<2I", 1, 1) + b"ab")


def test_slim_full_boundary_u16_edges():
    """The slim layout's u16 dims/length fields: 65535 is the last value
    that fits, 65536 must fall back to the full layout, and both layouts
    round-trip the same logical fields at the edge."""
    s = [b"a", b"b"]
    d1 = container.write_container(CodecConfig(width=65535, height=16), s)
    assert d1[4] & container.SLIM
    # slim bit 5 = container CRC present (default on, cleared by
    # check=False); bit 6 = explicit lanes byte (absent here: auto lanes)
    assert (d1[5] >> 5) & 1 and not (d1[5] >> 6) & 1
    d1n = container.write_container(
        CodecConfig(width=65535, height=16), s, check=False)
    assert not (d1n[5] >> 5) & 1 and len(d1n) == len(d1) - 4
    cfg1, out1, _, _, _, _ = container.read_container(d1)
    assert cfg1.width == 65535 and out1 == s
    d2 = container.write_container(CodecConfig(width=65536, height=16), s)
    assert not (d2[4] & container.SLIM)
    assert (d2[5] >> 5) & 1
    cfg2, out2, _, _, _, _ = container.read_container(d2)
    assert cfg2.width == 65536 and out2 == s
    # substream length edge: 65535 B stays slim, 65536 B forces full
    big = b"x" * 65535
    d3 = container.write_container(CodecConfig(width=16, height=16), [big, b"y"])
    assert d3[4] & container.SLIM
    assert container.read_container(d3)[1] == [big, b"y"]
    big2 = b"x" * 65536
    d4 = container.write_container(CodecConfig(width=16, height=16), [big2, b"y"])
    assert not (d4[4] & container.SLIM)
    assert container.read_container(d4)[1] == [big2, b"y"]
