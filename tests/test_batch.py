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
