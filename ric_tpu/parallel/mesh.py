"""Device mesh helpers.

The codec's parallel axes (SURVEY.md §2 parallelism inventory):
  dp — data parallel: a batch of images
  sp — spatial parallel: one image tiled across devices (the codec-domain
       "sequence parallelism"); per-tile substreams stitch deterministically
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None):
    """2-D (dp, sp) mesh over the first n devices. dp defaults to 2 when the
    device count is even, else 1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 1 else 1
    sp = n // dp
    import numpy as np

    return Mesh(np.asarray(devs).reshape(dp, sp), ("dp", "sp"))
