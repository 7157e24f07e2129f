"""Test configuration: run the suite on an 8-device virtual CPU mesh.

SURVEY.md §4.3: multi-chip logic (shard_map/ppermute halos, stream
stitching) is exercised on one host via XLA's host-platform device
emulation; the same tests run unmodified on real TPU meshes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# The axon site hook pins jax_platforms to "axon,cpu"; tests must run on the
# virtual 8-device CPU mesh (config wins over the env var here).
jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
@pytest.fixture
def rng():
    return np.random.default_rng(1234)
