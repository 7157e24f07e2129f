"""Lane-sharded (tensor-style) entropy: byte-identical to single device."""
import numpy as np
import pytest

import jax

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel import lanes
from ric_tpu.parallel.mesh import make_mesh

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8
@pytest.mark.parametrize("quant", [0, 9])
def test_lane_sharded_encode_matches(rng, quant):
    h, w = 128, 256
    cfg = CodecConfig(width=w, height=h, quant=quant,
                      transform=Transform.CDF53 if quant == 0 else Transform.CDF97,
                      levels=3)
    x = (np.clip(128 + 40 * rng.standard_normal((h, w)), 0, 255)
         .astype(np.int32) - 128)
    if quant:
        x = x << 4
    mesh = make_mesh(8, dp=1)
    fn = lanes.build_lane_sharded_encode(cfg, mesh)
    wA, tA, wB, tB = fn(x)
    a = image_codec.words_to_bytes(wA, int(tA))
    b = image_codec.words_to_bytes(wB, int(tB))
    a_ref, b_ref = image_codec.encode_plane_bytes(x, cfg, chroma=False)
    assert a == a_ref and b == b_ref
