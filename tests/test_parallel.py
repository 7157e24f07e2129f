"""Multi-device tests on the virtual 8-CPU mesh: tiled encode round-trip
and mesh-shape-independent deterministic bitstreams (SURVEY.md §4.3-4.4)."""
import numpy as np
import pytest

import jax

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.parallel import tiling
from ric_tpu.parallel.mesh import make_mesh


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _img(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 70 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
    img = img + rng.normal(0, 5, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


@needs_8
def test_tiled_encode_roundtrip(rng):
    img = _img(rng, 64, 8 * 32)
    cfg = CodecConfig(width=8 * 32, height=64, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_mesh(8, dp=1)
    x = (img.astype(np.int32) - 128)
    streams, tile_cfg = tiling.encode_image_tiled(x, cfg, mesh)
    out = tiling.decode_image_tiled(streams, cfg, tile_cfg)
    np.testing.assert_array_equal(out, x)


@needs_8
def test_tiled_matches_single_device_per_tile(rng):
    """Parallel multi-device encode must be bit-identical to encoding each
    tile sequentially on one device (deterministic stitching)."""
    from ric_tpu.models import image_codec

    img = _img(rng, 64, 4 * 32)
    x = img.astype(np.int32) - 128
    cfg = CodecConfig(width=4 * 32, height=64, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh4 = make_mesh(4, dp=1)
    s4, tile_cfg = tiling.encode_image_tiled(x, cfg, mesh4)
    for t in range(4):
        tile = x[:, t * 32 : (t + 1) * 32]
        a, b = image_codec.encode_plane_bytes(tile, tile_cfg, chroma=False)
        assert s4[2 * t] == a and s4[2 * t + 1] == b


@needs_8
def test_tiled_odd_tile_dims(rng):
    """VERDICT item 4: a 4x509-wide (odd per-tile) image on the mesh —
    independent tiles handle any WxH like the reference (wavelet2d.cpp:
    73-79 ceil/floor splits), no divisibility requirement."""
    h, w = 263, 4 * 509
    img = _img(rng, h, w)
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_mesh(4, dp=1)
    x = img.astype(np.int32) - 128
    streams, tile_cfg = tiling.encode_image_tiled(x, cfg, mesh)
    assert tile_cfg.width == 509
    out = tiling.decode_image_tiled(streams, cfg, tile_cfg)
    np.testing.assert_array_equal(out, x)


@needs_8
def test_tiled_container_color_roundtrip(rng):
    """Color lossless tiled round-trip through the RTP1 container
    (VERDICT item 5)."""
    from ric_tpu.models import image_codec

    h, w = 48, 4 * 32
    img = np.stack([_img(rng, h, w) for _ in range(3)], axis=-1)
    cfg = CodecConfig(width=w, height=h, channels=3, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_mesh(4, dp=1)
    data = tiling.encode_image_tiled_container(img, cfg, mesh)
    out = image_codec.decode_image(data)
    np.testing.assert_array_equal(out, img.astype(np.int32))


@needs_8
def test_tiled_container_16bit_nondivisible(rng):
    """16-bit gray + non-divisible width through the tiled container."""
    from ric_tpu.models import image_codec

    h, w = 40, 97
    img = rng.integers(0, 1 << 16, size=(h, w)).astype(np.uint16)
    cfg = CodecConfig(width=w, height=h, quant=0, transform=Transform.CDF53,
                      levels=2, input_depth=16)
    mesh = make_mesh(4, dp=1)
    data = tiling.encode_image_tiled_container(img, cfg, mesh)
    out = image_codec.decode_image(data)
    assert out.shape == (h, w)
    np.testing.assert_array_equal(out, img.astype(np.int32))


@needs_8
def test_tiled_non_divisible_width(rng):
    """Width that doesn't divide into the mesh: internal edge padding,
    cropped away on decode."""
    h, w = 64, 4095  # 4095 / 8 tiles -> pad to 8*512
    img = _img(rng, h, w)
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_mesh(8, dp=1)
    x = img.astype(np.int32) - 128
    streams, tile_cfg = tiling.encode_image_tiled(x, cfg, mesh)
    assert tile_cfg.width == 512
    out = tiling.decode_image_tiled(streams, cfg, tile_cfg)
    assert out.shape == (h, w)
    np.testing.assert_array_equal(out, x)
