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

# The full suite loads thousands of XLA:CPU executables in one process
# (~6 mmaps each); at the default vm.max_map_count=65530 the process hits
# the kernel map limit near the end of the run and LLVM aborts the next
# compile (the round-3 "suite cannot finish in one process" mystery —
# measured 64.8k maps right before the crash point). Raise it when we
# can; harmless if not permitted.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < (1 << 20):
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write(str(1 << 21))
except (OSError, ValueError):
    pass

import jax

# The axon site hook pins jax_platforms to "axon,cpu"; tests must run on the
# virtual 8-device CPU mesh (config wins over the env var here).
jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)
@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# RIC_DIAG=1: print per-test process resource counters (fds, threads, rss)
# to stderr — diagnosing the in-process suite abort (XLA compile SIGABRT
# after ~200 tests; fine when files run alone).
if os.environ.get("RIC_DIAG"):
    import threading

    def pytest_runtest_teardown(item):
        try:
            nfd = len(os.listdir("/proc/self/fd"))
            with open("/proc/self/status") as f:
                rss = next(
                    (l.split()[1] for l in f if l.startswith("VmRSS")), "?")
            print(f"[diag] {item.nodeid}: fds={nfd} "
                  f"threads={threading.active_count()} rss={rss}kB",
                  file=sys.stderr, flush=True)
        except Exception:
            pass
