"""Tracing / profiling / metrics (SURVEY.md §5 auxiliary subsystems).

The reference's only observability is size prints and band variance dumps
(rududucodec.cpp:72,99; wavelet2d.cpp:275-303). Here:
  * `stage(name)` context manager — wall-time per pipeline stage with
    device completion (block_until_ready) and Mpix/s rates
  * `device_trace(dir)` — wraps jax.profiler for XLA-level traces viewable
    in TensorBoard/Perfetto
  * `Metrics` — structured JSON metrics (bpp, PSNR, Mpix/s, scaling
    efficiency) as emitted by bench.py / tools
"""
from __future__ import annotations

import contextlib
import json
import time

import jax


class StageTimer:
    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        yield
        if result_holder is not None:
            jax.block_until_ready(result_holder)
        self.stages[name] = self.stages.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self, npix: int | None = None) -> str:
        lines = []
        for k, v in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            rate = f"  {npix / v / 1e6:8.1f} Mpix/s" if npix else ""
            lines.append(f"{k:28s} {v * 1000:8.1f} ms{rate}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA-level profiler trace (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    def __init__(self):
        self.data: dict = {}

    def set(self, **kv):
        self.data.update(kv)

    def json(self) -> str:
        return json.dumps(self.data)
