"""Multi-host (DCN) initialization for pod-scale deployments.

SURVEY §2.2 / §5: intra-slice scaling rides ICI via the sharded table
(parallel/sharded.py); beyond one host, standard JAX multi-process SPMD
applies — every host runs the same program, `jax.distributed.initialize`
wires the DCN layer, and the global mesh spans all processes' devices.

This module is exercised only on real multi-host slices (this build
environment has a single chip); the sharding logic it feeds is covered by
the 8-virtual-device CPU tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up DCN.  With no args, relies on the cluster environment
    (TPU pods auto-detect; GKE/GCE metadata)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_table_mesh() -> Mesh:
    """One flat 'd' axis over every device in the job: the bucket-sharded
    table spans the full slice; queries replicate; the voting psum/pmin
    collectives ride ICI within a slice and DCN across slices."""
    return Mesh(np.asarray(jax.devices()), axis_names=("d",))


def process_local_batch_slice(global_batch: int) -> slice:
    """Each host decodes/feeds its own slice of a data-parallel batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
