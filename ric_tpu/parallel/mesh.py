"""Device mesh helpers.

The codec's parallel axes (SURVEY.md §2 parallelism inventory):
  dp — data parallel: a batch of images
  sp — spatial parallel: one image tiled across devices (the codec-domain
       "sequence parallelism"); per-tile substreams stitch deterministically
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int = 1):
    """2-D (dp, sp) mesh over the first n devices. All devices go to the
    spatial axis by default (dp=1) — an sp workload on every chip is the
    common case; pass dp explicitly for batch sharding."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    sp = n // dp
    import numpy as np

    return Mesh(np.asarray(devs).reshape(dp, sp), ("dp", "sp"))
