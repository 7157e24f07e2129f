"""CLI round-trip tests (ric-compatible flags)."""
import os

import numpy as np
import pytest

from ric_tpu import cli
from ric_tpu.utils import pnm


def test_cli_lossless_roundtrip(rng, tmp_path):
    img = np.clip(
        128 + 50 * rng.standard_normal((48, 64)), 0, 255
    ).astype(np.uint8)
    src = str(tmp_path / "t.pgm")
    pnm.write_pnm(src, img)
    assert cli.main(["-i", src, "-q", "0"]) == 0
    ric = str(tmp_path / "t.ric")
    assert os.path.exists(ric)
    assert cli.main(["-i", ric, "-o", str(tmp_path / "out.pgm")]) == 0
    out = pnm.read_pnm(str(tmp_path / "out.pgm"))
    np.testing.assert_array_equal(out, img)


def test_cli_lossy_dither(rng, tmp_path):
    img = np.clip(
        128 + 40 * rng.standard_normal((48, 48)), 0, 255
    ).astype(np.uint8)
    src = str(tmp_path / "t.pgm")
    pnm.write_pnm(src, img)
    assert cli.main(["-i", src, "-q", "9"]) == 0
    assert cli.main(
        ["-i", str(tmp_path / "t.ric"), "-o", str(tmp_path / "o.pgm"), "-d"]
    ) == 0
    out = pnm.read_pnm(str(tmp_path / "o.pgm"))
    assert out.shape == img.shape


def test_cli_color_roundtrip(rng, tmp_path):
    img = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
    src = str(tmp_path / "c.ppm")
    pnm.write_pnm(src, img)
    assert cli.main(["-i", src, "-q", "0"]) == 0
    assert cli.main(
        ["-i", str(tmp_path / "c.ric"), "-o", str(tmp_path / "c_out.pnm")]
    ) == 0
    out = pnm.read_pnm(str(tmp_path / "c_out.pnm"))
    np.testing.assert_array_equal(out, img)
