"""Multi-host logic tested with N local processes via jax.distributed
loopback (SURVEY.md §4.3): 2 processes x 2 virtual CPU devices = a global
4-device mesh; mode-1 tiled encode + cross-process substream gather must
be deterministic and identical to a single-process encode."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_loopback(tmp_path):
    nproc = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]

    blobs = [(tmp_path / f"out_{i}.bin").read_bytes() for i in range(nproc)]
    gold = (tmp_path / "gold.bin").read_bytes()
    assert len(gold) > 0
    # every process stitched identical bytes == single-process encode
    assert blobs[0] == gold
    assert all(b == blobs[0] for b in blobs)
