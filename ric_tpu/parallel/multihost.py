"""Multi-host distribution (SURVEY.md §2/§5 communication backend).

The TPU equivalent of the reference's (absent) MPI/NCCL layer is
`jax.distributed` + pjit/shard_map over a global mesh: collectives ride ICI
within a host and DCN across hosts with no custom transport. This module
wraps initialization and global-mesh construction; the codec's parallel
paths (ric_tpu/parallel/tiling.py) are mesh-agnostic, so the same
shard_map code runs on a single-host virtual mesh (tests), one real host,
or a multi-host pod slice.

Restart/elasticity model: encode is stateless per image/tile and every
tile substream is independent (container records per-tile lengths), so a
failed multi-host job resumes at per-image granularity; corrupt streams
are localized to one tile by the container CRCs.

Single-host loopback testing: run N processes of the same script with
  python -m ric_tpu.parallel.multihost --selftest N
style initialization (jax.distributed with a local coordinator).
"""
from __future__ import annotations

import os

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX. No-ops when env/args are absent (single
    host). On TPU pods the runtime usually auto-discovers everything."""
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    if coordinator_address is None and num_processes is None:
        # Auto-discovery: only attempt it when a cluster environment is
        # actually advertised (TPU pod metadata / SLURM / Open MPI). A
        # plain single host skips cleanly; a *failed* multi-host bring-up
        # in a real cluster env propagates — it must not degrade silently
        # to single-host.
        cluster_env = (
            "TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES",
            "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID",
            "OMPI_MCA_orte_hnp_uri",
        )
        if not any(v in os.environ for v in cluster_env):
            return  # no cluster environment: single-host mode
        jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(dp: int = 1):
    """(dp, sp) mesh over all global devices (all hosts). All devices go
    to the spatial axis by default; pass dp for batch sharding."""
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()  # global device list across processes
    n = len(devs)
    return Mesh(np.asarray(devs).reshape(dp, n // dp), ("dp", "sp"))
