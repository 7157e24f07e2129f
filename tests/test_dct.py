"""binDCT-L3 + lapped filter tests.

The reference binDCT has a x4-per-dimension gain compensated inside its
quantization tables (see models/dct.py docstring); round-trip tests check
against 16*x with a small bounded rounding error. The lapped pre/post
filters are exact integer inverses.
"""
import numpy as np
import jax.numpy as jnp

from ric_tpu.models import dct


def test_dct_roundtrip_scaled(rng):
    x = rng.integers(-2048, 2048, size=(64, 64)).astype(np.int32)
    c = dct.dct2d_blocks(jnp.asarray(x))
    y = np.asarray(dct.idct2d_blocks(c))
    err = np.abs(y - 16 * x)
    assert err.max() <= 64, err.max()  # shift-rounding noise only


def test_lapped_roundtrip_exact(rng):
    x = rng.integers(-2048, 2048, size=(64, 48)).astype(np.int32)
    y = dct.lapped_post(dct.lapped_pre(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_dct_energy_compaction():
    yy, xx = np.mgrid[0:8, 0:8]
    x = (100 + 10 * xx + 5 * yy).astype(np.int32)
    c = np.asarray(dct.dct2d_blocks(jnp.asarray(x)))
    total = float((c.astype(np.float64) ** 2).sum())
    dc_low = float((c[:2, :2].astype(np.float64) ** 2).sum())
    assert dc_low / total > 0.95


def test_dct_quant_reconstruction(rng):
    # full lossy path: pre -> dct -> quant -> dequant -> idct -> post
    yy, xx = np.mgrid[0:32, 0:32]
    x = (40 * np.sin(xx / 5.0) * np.cos(yy / 7.0)).astype(np.int32) << 4
    c = dct.dct2d_blocks(dct.lapped_pre(jnp.asarray(x)))
    q = dct.tsuq_dct(c, 50)
    r = dct.tsuq_dct_inverse(q, 50)
    y = np.asarray(dct.lapped_post(dct.idct2d_blocks(r)))
    # reconstruction error bounded by quantizer coarseness
    rms = float(np.sqrt(np.mean((y - x) ** 2)))
    assert rms < 48, rms


def test_dct_profile_roundtrip_gray(rng):
    """End-to-end DCT coding profile: container flags bit 7, lossy
    roundtrip with reasonable quality (VERDICT r3 item 7)."""
    from ric_tpu.config import CodecConfig
    from ric_tpu.models import dct_codec, image_codec

    h, w = 61, 75  # arbitrary dims: internal pad to 8
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, quant=9)
    data = dct_codec.encode_image_dct(img, cfg)
    out = image_codec.decode_image(data)
    assert out.shape == (h, w)
    mse = float(np.mean((out.astype(np.float64) - img) ** 2))
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 28.0, f"DCT profile PSNR {psnr:.2f}"
    # coarser quant shrinks the stream
    cfg2 = CodecConfig(width=w, height=h, quant=20)
    data2 = dct_codec.encode_image_dct(img, cfg2)
    assert len(data2) < len(data)


def test_dct_profile_roundtrip_color(rng):
    from ric_tpu.config import CodecConfig
    from ric_tpu.models import dct_codec, image_codec

    h, w = 48, 64
    img = np.clip(
        128 + 40 * rng.standard_normal((h, w, 3)), 0, 255).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, channels=3, quant=9)
    data = dct_codec.encode_image_dct(img, cfg)
    out = image_codec.decode_image(data)
    assert out.shape == (h, w, 3)
    mse = float(np.mean((out.astype(np.float64) - img) ** 2))
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 25.0, f"DCT color PSNR {psnr:.2f}"
