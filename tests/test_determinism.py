"""Determinism: identical inputs -> identical bytes, across runs and
profiles (the TPU replacement for the reference's absent race detection;
SURVEY.md §5)."""
import numpy as np

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec


def test_encode_bytes_deterministic(rng):
    img = np.clip(
        128 + 45 * rng.standard_normal((96, 80)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=80, height=96, quant=0, transform=Transform.CDF53)
    a = image_codec.encode_image(img, cfg)
    b = image_codec.encode_image(img, cfg)
    assert a == b
    cfg9 = CodecConfig(width=80, height=96, quant=9,
                       transform=Transform.CDF97)
    assert image_codec.encode_image(img, cfg9) == image_codec.encode_image(
        img, cfg9
    )


def test_archival_bytes_deterministic(rng):
    img = np.clip(
        128 + 45 * rng.standard_normal((64, 64)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=64, height=64, quant=0)
    a = image_codec.encode_image(img, cfg, profile="archival")
    b = image_codec.encode_image(img, cfg, profile="archival")
    assert a == b
