"""Archival (serial adaptive range coder) profile: round-trip + compression."""
import numpy as np
import pytest

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec


def _synthetic(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 60 * np.sin(xx / 19.0) * np.cos(yy / 13.0)
    img = img + rng.normal(0, 6, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_archival_lossless_roundtrip(rng):
    img = _synthetic(rng, 64, 96)
    cfg = CodecConfig(width=96, height=64, quant=0, transform=Transform.CDF53)
    data = image_codec.encode_image(img, cfg, profile="archival")
    out = image_codec.decode_image(data)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_archival_beats_rans_on_small_images(rng):
    # small images use corpus rANS tables; the adaptive serial coder should
    # compress at least as well (no lane-state overhead, adapts to content)
    img = _synthetic(rng, 128, 128)
    cfg = CodecConfig(width=128, height=128, quant=0,
                      transform=Transform.CDF53)
    d_rans = image_codec.encode_image(img, cfg, profile="rans")
    d_arch = image_codec.encode_image(img, cfg, profile="archival")
    out = image_codec.decode_image(d_arch)
    np.testing.assert_array_equal(out, img.astype(np.int32))
    assert len(d_arch) < len(d_rans), (len(d_arch), len(d_rans))
