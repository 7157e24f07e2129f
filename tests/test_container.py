"""Container validation: magic, CRC corruption localization."""
import numpy as np
import pytest

from ric_tpu.config import CodecConfig
from ric_tpu.utils import container


def test_bad_magic():
    with pytest.raises(container.BadMagic):
        container.read_container(b"NOPE" + b"\x00" * 64)


def test_crc_roundtrip_and_corruption():
    cfg = CodecConfig(width=16, height=16)
    streams = [b"hello world!", b"stream two bytes"]
    data = container.write_container(cfg, streams)
    cfg2, out, tiles, arch = container.read_container(data)
    assert out == streams and not arch
    # flip a byte inside the second substream
    bad = bytearray(data)
    bad[-3] ^= 0xFF
    with pytest.raises(container.CorruptStream, match="substream 1"):
        container.read_container(bytes(bad))
