"""Data-parallel batch encode: sharded batch == per-image encode."""
import numpy as np
import pytest

import jax

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel.mesh import make_mesh

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8
def test_batch_encode_matches_single(rng):
    B, h, w = 8, 48, 64
    imgs = np.clip(
        128 + 40 * rng.standard_normal((B, h, w)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, quant=0, transform=Transform.CDF53,
                      levels=3)
    mesh = make_mesh(8, dp=8)
    batch = image_codec.encode_batch(imgs, cfg, mesh=mesh)
    for i in range(B):
        single = image_codec.encode_image(imgs[i], cfg)
        assert batch[i] == single
        out = image_codec.decode_image(batch[i])
        np.testing.assert_array_equal(out, imgs[i].astype(np.int32))


@needs_8
def test_batch_decode_sharded_matches_encode(rng):
    """decode_batch: dp-sharded decode twin (VERDICT item 5)."""
    B, h, w = 8, 48, 64
    imgs = np.clip(
        128 + 40 * rng.standard_normal((B, h, w)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, quant=0, transform=Transform.CDF53,
                      levels=3)
    mesh = make_mesh(8, dp=8)
    datas = image_codec.encode_batch(imgs, cfg, mesh=mesh)
    out = image_codec.decode_batch(datas, mesh=mesh)
    np.testing.assert_array_equal(out, imgs.astype(np.int32))


@needs_8
def test_batch_color_roundtrip(rng):
    B, h, w = 4, 48, 64
    imgs = np.clip(
        128 + 40 * rng.standard_normal((B, h, w, 3)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, channels=3, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_mesh(4, dp=4)
    datas = image_codec.encode_batch(imgs, cfg, mesh=mesh)
    assert datas[0] == image_codec.encode_image(imgs[0], cfg)
    out = image_codec.decode_batch(datas, mesh=mesh)
    np.testing.assert_array_equal(out, imgs.astype(np.int32))


def test_batch_16bit_lossy_matches_single(rng):
    """ADVICE round-1 medium: 16-bit lossy batch must skip the 8-bit
    SHIFT like encode_image does."""
    B, h, w = 2, 48, 64
    imgs = rng.integers(0, 1 << 16, size=(B, h, w)).astype(np.uint16)
    cfg = CodecConfig(width=w, height=h, quant=9, transform=Transform.CDF97,
                      levels=3, input_depth=16)
    datas = image_codec.encode_batch(imgs, cfg)
    for i in range(B):
        assert datas[i] == image_codec.encode_image(imgs[i], cfg)
    out = image_codec.decode_batch(datas)
    ref0 = image_codec.decode_image(datas[0])
    np.testing.assert_array_equal(out[0], ref0)
