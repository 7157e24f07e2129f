"""Pipeline-parallel encode: 2-device stage split must produce the exact
single-device bitstreams (SURVEY.md §2 pipeline parallel)."""
import numpy as np
import pytest

import jax

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel import pipeline

needs_2 = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 (virtual) devices"
)


@needs_2
def test_pipeline_matches_single_device(rng):
    h, w = 64, 96
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF53, levels=3)
    planes = [
        np.clip(128 + 40 * rng.standard_normal((h, w)), 0, 255).astype(
            np.int32
        ) - 128
        for _ in range(4)
    ]
    d0, d1 = jax.devices()[:2]
    enc_stream = pipeline.build_pipeline_encoder(cfg, d0, d1)
    got = enc_stream(planes)
    assert len(got) == 4
    for x, (wA, tA, wB, tB) in zip(planes, got):
        a_ref, b_ref = image_codec.encode_plane_bytes(x, cfg, chroma=False)
        assert image_codec.words_to_bytes(wA, tA) == a_ref
        assert image_codec.words_to_bytes(wB, tB) == b_ref
        out = image_codec.decode_plane_bytes(a_ref, b_ref, cfg, chroma=False)
        np.testing.assert_array_equal(out, x)
