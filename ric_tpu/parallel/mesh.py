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


def make_grid_mesh(spy: int, spx: int, n_devices: int | None = None):
    """2-D spatial (spy, sp) mesh: the image plane is tiled as a grid,
    rows over `spy`, columns over `sp` (mode-2 halo exchange runs on both
    axes)."""
    devs = jax.devices()
    n = n_devices or spy * spx
    assert spy * spx == n, f"grid {spy}x{spx} != {n} devices"
    import numpy as np

    return Mesh(np.asarray(devs[:n]).reshape(spy, spx), ("spy", "sp"))
