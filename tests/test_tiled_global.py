"""Mode-2 tiled codec: global DWT over the mesh + per-tile entropy.

Decoded output must be bit-identical to the untiled codec at the same
config (SURVEY.md §4.4 metamorphic requirement, realized at the pixel
level; streams differ by tile layout only).
"""
import numpy as np
import pytest

import jax

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec
from ric_tpu.parallel import tiling
from ric_tpu.parallel.mesh import make_mesh

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _img(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 70 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
    img = img + rng.normal(0, 5, (h, w))
    return np.clip(img, 0, 255).astype(np.int32) - 128


@needs_8
@pytest.mark.parametrize("quant", [0, 9])
def test_tiled_global_matches_untiled(rng, quant):
    h, w = 64, 512
    x = _img(rng, h, w)
    if quant:
        x = x << 4
    cfg = CodecConfig(width=w, height=h, quant=quant,
                      transform=Transform.CDF53 if quant == 0 else Transform.CDF97,
                      levels=3)
    mesh = make_mesh(4, dp=1)
    streams = tiling.encode_image_tiled_global(x, cfg, mesh)
    out = tiling.decode_image_tiled_global(streams, cfg, mesh)
    # untiled reference result
    a, b = image_codec.encode_plane_bytes(x, cfg, chroma=False)
    ref = image_codec.decode_plane_bytes(a, b, cfg, chroma=False)
    np.testing.assert_array_equal(out, ref)
    if quant == 0:
        np.testing.assert_array_equal(out, x)


@needs_8
@pytest.mark.parametrize("quant", [0, 9])
def test_grid_tiled_global_matches_untiled(rng, quant):
    """2-D (spy, sp) tile grid, both axes halo-exchanged (VERDICT item 4)."""
    from ric_tpu.parallel.mesh import make_grid_mesh

    h, w = 128, 256
    x = _img(rng, h, w)
    if quant:
        x = x << 4
    cfg = CodecConfig(width=w, height=h, quant=quant,
                      transform=Transform.CDF53 if quant == 0 else Transform.CDF97,
                      levels=3)
    mesh = make_grid_mesh(2, 4)
    streams = tiling.encode_image_tiled_global(x, cfg, mesh)
    assert len(streams) == 2 * 8
    out = tiling.decode_image_tiled_global(streams, cfg, mesh)
    a, b = image_codec.encode_plane_bytes(x, cfg, chroma=False)
    ref = image_codec.decode_plane_bytes(a, b, cfg, chroma=False)
    np.testing.assert_array_equal(out, ref)
    if quant == 0:
        np.testing.assert_array_equal(out, x)


@needs_8
def test_tiled_global_arbitrary_size_lossless(rng):
    """Non-divisible dims: internal edge padding encodes, decode crops it
    away; lossless round-trip stays bit-exact (VERDICT item 4)."""
    from ric_tpu.parallel.mesh import make_grid_mesh

    h, w = 109, 223  # primes — divisible by nothing
    x = _img(rng, h, w)
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF53, levels=3)
    mesh = make_grid_mesh(2, 4)
    streams, pcfg = tiling.encode_image_tiled_global_any(x, cfg, mesh)
    assert pcfg.width % (4 * 4 * 2**3) == 0
    out = tiling.decode_image_tiled_global_any(streams, cfg, pcfg, mesh)
    assert out.shape == (h, w)
    np.testing.assert_array_equal(out, x)


def test_mode2_container_roundtrip_color(rng):
    """Mode-2 product surface: RGB image -> mode-2 container (single
    device, no mesh) -> decode_image routing -> exact pixels."""
    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.models import image_codec
    from ric_tpu.parallel import tiling

    h, w = 70, 150  # arbitrary dims: pad_for_grid handles the grid
    img = np.clip(
        128 + 40 * rng.standard_normal((h, w, 3)), 0, 255
    ).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, channels=3, quant=0,
                      transform=Transform.CDF53, levels=2)
    data = tiling.encode_image_tiled_global_container(img, cfg, tiles=(2, 2))
    out = image_codec.decode_image(data)
    assert out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_mode2_container_mesh_matches_single_device(rng):
    """The mesh (halo-DWT) and single-device mode-2 encoders must produce
    byte-identical containers; decode needs no mesh."""
    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.models import image_codec
    from ric_tpu.parallel import tiling
    from ric_tpu.parallel.mesh import make_mesh

    h, w = 64, 128
    img = np.clip(
        128 + 40 * rng.standard_normal((h, w)), 0, 255).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF97, levels=2)
    mesh = make_mesh(2, dp=1)  # sp=2
    d_mesh = tiling.encode_image_tiled_global_container(
        img, cfg, tiles=(2, 1), mesh=mesh)
    d_single = tiling.encode_image_tiled_global_container(
        img, cfg, tiles=(2, 1))
    assert d_mesh == d_single
    out = image_codec.decode_image(d_mesh)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_mode2_container_16bit(rng):
    """Mode-2 with 16-bit input depth round-trips losslessly."""
    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.models import image_codec
    from ric_tpu.parallel import tiling

    h, w = 64, 64
    img = rng.integers(0, 1 << 16, size=(h, w)).astype(np.uint16)
    cfg = CodecConfig(width=w, height=h, quant=0,
                      transform=Transform.CDF53, levels=2, input_depth=16)
    data = tiling.encode_image_tiled_global_container(img, cfg, tiles=(2, 1))
    out = image_codec.decode_image(data)
    np.testing.assert_array_equal(out, img.astype(np.int32))
