"""End-to-end video codec: GOP round-trip, P-frame quality/efficiency."""
import numpy as np
import pytest

from ric_tpu.models import video_codec
from ric_tpu.utils.metrics import psnr


def _video(rng, n, h, w):
    """Moving textured content: a smooth pattern panning across frames."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 60 * np.sin(xx / 11.0) * np.cos(yy / 13.0)
        + 30 * np.sin((xx + yy) / 7.0)
    )
    frames = []
    for t in range(n):
        f = np.roll(base, (t, 2 * t), axis=(0, 1))
        f = f + rng.normal(0, 2, (h, w))
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return np.stack(frames)


def test_video_roundtrip_quality(rng):
    frames = _video(rng, 5, 64, 64)
    data = video_codec.encode_video(frames, quant=6, gop=4)
    out = video_codec.decode_video(data)
    assert out.shape == frames.shape
    for t in range(5):
        p = psnr(out[t], frames[t])
        assert p > 30, f"frame {t}: {p:.2f} dB"


def test_pframes_beat_intra_coding(rng):
    # high-detail panning content at the finest video quant: P-frames must
    # save real bits vs all-intra
    yy, xx = np.mgrid[0:128, 0:128]
    base = 128 + 60 * np.sin(xx / 3.0) * np.cos(yy / 5.0) + 40 * np.sin(
        (2 * xx + yy) / 7.0
    )
    frames = np.stack(
        [
            np.clip(np.roll(base, (t, 2 * t), axis=(0, 1)), 0, 255).astype(
                np.uint8
            )
            for t in range(4)
        ]
    )
    inter = video_codec.encode_video(frames, quant=1, gop=4)
    intra = video_codec.encode_video(frames, quant=1, gop=1)
    # at this toy frame size the fixed rANS lane-state overhead dominates;
    # the P-frame residual payloads themselves are ~6x smaller than intra
    assert len(inter) < 0.85 * len(intra), (len(inter), len(intra))


def test_video_color_roundtrip_quality(rng):
    """Color video: all three YCoCg planes coded per frame
    (reference rududucodec.cpp:67-76)."""
    g = _video(rng, 4, 64, 64)
    frames = np.stack(
        [g, np.roll(g, 7, axis=2), 255 - g], axis=-1
    ).astype(np.uint8)
    data = video_codec.encode_video(frames, quant=6, gop=3)
    out = video_codec.decode_video(data)
    assert out.shape == frames.shape
    for t in range(4):
        p = psnr(out[t], frames[t])
        assert p > 30, f"frame {t}: {p:.2f} dB"


def test_video_lossless_gray(rng):
    frames = _video(rng, 3, 64, 64)
    data = video_codec.encode_video(frames, quant=0, gop=2)
    out = video_codec.decode_video(data)
    np.testing.assert_array_equal(out, frames)


def test_mv_roundtrip(rng):
    import jax.numpy as jnp

    gy, gx = 6, 9
    mvy = jnp.asarray(rng.integers(-40, 40, (gy, gx)), jnp.int32)
    mvx = jnp.asarray(rng.integers(-40, 40, (gy, gx)), jnp.int32)
    intra = jnp.asarray(rng.random((gy, gx)) < 0.2)
    data = video_codec.encode_mv(mvy, mvx, intra)
    my, mx, i2, _ = video_codec.decode_mv(data, gy, gx)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(intra))
    sel = ~np.asarray(intra)
    np.testing.assert_array_equal(np.asarray(my)[sel], np.asarray(mvy)[sel])
    np.testing.assert_array_equal(np.asarray(mx)[sel], np.asarray(mvx)[sel])


def test_video_multiref_roundtrip_quality(rng):
    """Multi-reference ring (n_refs=2): per-block best-of-last-2 recon
    selection, coded ref indices, drift-free decode."""
    frames = _video(rng, 5, 64, 64)
    # make frame content alternate so older refs genuinely win sometimes
    frames[2] = frames[0]
    data = video_codec.encode_video(frames, quant=6, gop=5, n_refs=2)
    out = video_codec.decode_video(data)
    assert out.shape == frames.shape
    for t in range(5):
        p = psnr(out[t], frames[t])
        assert p > 30, f"frame {t}: {p:.2f} dB"


def test_yv12_output():
    """YV12 conversion matches the reference's fixed-point matrix
    (image.cpp:148-188) on hand-computed values."""
    import jax.numpy as jnp

    from ric_tpu.models import image_codec

    # neutral gray 128: y = 0 (after -128 << 4), co = cg = 0
    y = jnp.zeros((4, 4), jnp.int32)
    co = jnp.zeros((4, 4), jnp.int32)
    cg = jnp.zeros((4, 4), jnp.int32)
    yp, v, u = image_codec.ycocg_to_yv12(y, co, cg)
    # Y' = ((440 * 2048 + 2^12) >> 13) + 16 = 126
    assert int(yp[0, 0]) == ((440 * 2048 + (1 << 12)) >> 13) + 16
    assert int(u[0, 0]) == 128 and int(v[0, 0]) == 128
    assert yp.shape == (4, 4) and u.shape == (2, 2) and v.shape == (2, 2)
    # saturated red-ish chroma moves U and V in opposite directions
    co2 = jnp.full((4, 4), 127 << 3, jnp.int32)
    _, v2, u2 = image_codec.ycocg_to_yv12(y, co2, cg)
    assert int(v2[0, 0]) > 128 and int(u2[0, 0]) < 128


def test_video_arbitrary_dims(rng):
    """Non-multiple-of-8 frames pad internally (reference handles these
    via its BORDER margin, image.cpp:56-68) and crop back on decode."""
    from ric_tpu.models import video_codec

    n, h, w = 4, 37, 53
    t = np.arange(n)[:, None, None]
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.clip(
        128 + 60 * np.sin((xx + 3 * t) / 9.0) * np.cos(yy / 7.0)
        + rng.normal(0, 3, (n, h, w)), 0, 255).astype(np.uint8)
    data = video_codec.encode_video(frames, quant=8, gop=3)
    out = video_codec.decode_video(data)
    assert out.shape == (n, h, w)
    err = out.astype(np.float64) - frames.astype(np.float64)
    psnr = 10 * np.log10(255.0**2 / max(np.mean(err * err), 1e-9))
    assert psnr > 30.0, f"PSNR {psnr:.1f}"
