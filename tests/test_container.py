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
    assert len(data) == 19 + sum(len(s) for s in streams)
    cfg2, out, tiles, arch, _m2, _d = container.read_container(data)
    assert out == streams and not arch
    bad = bytearray(data)
    bad[-3] ^= 0xFF
    with pytest.raises(container.CorruptStream, match="container CRC"):
        container.read_container(bytes(bad))


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
