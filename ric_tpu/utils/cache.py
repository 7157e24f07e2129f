"""Persistent XLA compile-cache setup, fingerprinted by host CPU.

The cache stores XLA:CPU AOT results compiled for the features of the
machine that wrote them. This build box changes between sessions; loading
an entry whose instruction set is a superset of the current host's can
SIGILL mid-run (observed as the round-3 suite abort inside
backend_compile_and_load: "Machine type used for XLA:CPU compilation
doesn't match the machine type for execution ... SIGILL"). Keying the
cache directory by a hash of /proc/cpuinfo flags makes stale-host entries
invisible instead of fatal; same-host reruns keep the full cache benefit.
"""
from __future__ import annotations

import functools
import hashlib
import os
import platform

_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "build", "jax_cache")


@functools.lru_cache(maxsize=1)
def cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith(("flags", "Features")))
    except Exception:
        flags = platform.processor() or platform.machine()
    tag = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return f"{_BASE}-{tag}"


def setup(jax) -> str:
    """Point jax at the host-keyed persistent cache. Returns the dir."""
    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
