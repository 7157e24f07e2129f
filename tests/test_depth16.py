"""16-bit input support: deep decomposition lossless round-trip
(BASELINE.json config #4; exceeds the reference's effective 8-bit CLI)."""
import numpy as np

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec


def test_lossless_16bit_roundtrip(rng):
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        32768
        + 12000 * np.sin(xx / 19.0) * np.cos(yy / 13.0)
        + rng.normal(0, 700, (h, w))
    )
    img = np.clip(img, 0, 65535).astype(np.uint16)
    cfg = CodecConfig(width=w, height=h, quant=0, transform=Transform.CDF53,
                      levels=5, input_depth=16)
    data = image_codec.encode_image(img, cfg)
    out = image_codec.decode_image(data)
    np.testing.assert_array_equal(out, img.astype(np.int32))
    # sigma=700 noise alone has ~12.3 bpp differential entropy; small image
    # uses corpus tables, so just bound the overhead loosely
    bpp = len(data) * 8 / (h * w)
    assert bpp < 21, bpp
