"""Golden tests: our lifting == reference CWavelet2D bit-for-bit.

The oracle dumps all band coefficients in order (per level finest->coarsest:
D,H,V; then final L). Our pyramid is flattened in the same order. The
reference stores most bands as int16 (wrapping at each assignment), so the
comparison runs our wrap-compat mode; level_chg levels are int32.

Reference int16/int32 widening (wavelet2d.cpp:69-75,937-955): levels with
level <= level_chg store int32 AND the transform input for those levels is
the int16 LL widened to int32 — wrap applies down to the boundary only.
"""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np
import jax.numpy as jnp
import pytest

from ric_tpu.config import Transform
from ric_tpu.ops import lifting
from oracle import oracle


def our_bands_flat(x, trans, levels, level_chg):
    """Run our dwt with the reference's per-level wrap policy and flatten."""
    h, w = x.shape
    dims = lifting.level_dims(w, h, levels)
    nlev = len(dims)
    # Reference level numbering: topmost call has level=levels, decreasing.
    # Band type is int32 iff level <= level_chg  => our level index i
    # (0=finest) has ref level = levels - i; wrap iff levels - i > level_chg.
    out = []
    cur = jnp.asarray(x, jnp.int32)
    for i, (lh, lw) in enumerate(dims):
        wrap = (levels - i) > level_chg
        bands = lifting.dwt2d(cur, Transform(trans), wrap=wrap)
        out.append(np.asarray(bands["D"]).ravel())
        out.append(np.asarray(bands["H"]).ravel())
        out.append(np.asarray(bands["V"]).ravel())
        cur = bands["L"]
        if i == nlev - 1:
            out.append(np.asarray(cur).ravel())
    return np.concatenate(out)


@pytest.mark.parametrize("trans", [0, 1, 2])
@pytest.mark.parametrize("shape", [(512, 512), (263, 509), (96, 96)])
def test_transform_matches_reference(rng, trans, shape):
    levels, level_chg = 5, 1
    h, w = shape
    if trans == 2 and (h % 2 or w % 2):
        pytest.skip("reference Haar is broken on odd dims (SURVEY.md)")
    # 12-bit shifted domain as produced by the lossy input path
    x = ((rng.integers(0, 256, size=shape) - 128) << 4).astype(np.int16)
    ref = oracle.transform(x, levels, level_chg, trans)
    ours = our_bands_flat(x, trans, levels, level_chg)
    assert ref.shape == ours.shape
    mismatches = np.count_nonzero(ref != ours)
    assert mismatches == 0, f"{mismatches}/{ref.size} band coeffs differ"


@pytest.mark.parametrize("trans", [0, 1])
def test_transform_matches_reference_smooth(rng, trans):
    # Smooth content exercises different carry/shift paths than noise.
    h, w = 256, 320
    yy, xx = np.mgrid[0:h, 0:w]
    img = (96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 23.0)).astype(np.int64)
    x = ((img - 128) << 4).astype(np.int16)
    ref = oracle.transform(x, 5, 1, trans)
    ours = our_bands_flat(x, trans, 5, 1)
    assert np.array_equal(ref, ours)
