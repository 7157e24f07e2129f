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
