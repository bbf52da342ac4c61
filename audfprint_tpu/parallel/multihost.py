"""Multi-host (DCN) initialization for pod-scale deployments.

SURVEY §2.2 / §5: intra-slice scaling rides ICI via the sharded table
(parallel/sharded.py); beyond one host, standard JAX multi-process SPMD
applies — every host runs the same program, `jax.distributed.initialize`
wires the DCN layer, and the global mesh spans all processes' devices.

Tested for real by tests/test_multihost.py: two `jax.distributed` CPU
processes (localhost coordinator, Gloo collectives, 4 virtual devices each)
build the 8-device global mesh, run the bucket-sharded store + match across
the process boundary, and must reproduce the host oracle's rows exactly.
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
    """Each host decodes/feeds its own slice of a data-parallel batch.

    Remainder rows are spread over the first `global_batch % n` processes
    (slices of size per+1), so every row belongs to exactly one host."""
    n = jax.process_count()
    i = jax.process_index()
    per, rem = divmod(global_batch, n)
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))


def allgather_host_batch(local_rows: np.ndarray,
                         global_batch: int | None = None) -> np.ndarray:
    """Assemble the replicated global batch from per-process local slices.

    The multi-host ingest/match pattern: each host decodes its OWN files
    (its process_local_batch_slice of the input list), then the hash/query
    streams are allgathered across processes — the sharded store and match
    consume replicated streams, so this one collective is the only
    host-boundary data movement on the input side.  Single-process: the
    identity.

    Pass `global_batch` when it is not divisible by process_count: local
    slices are padded to a common size for the collective (allgather needs
    equal shapes) and the padding rows are dropped on reassembly."""
    if jax.process_count() == 1:
        return np.asarray(local_rows)
    from jax.experimental import multihost_utils

    n = jax.process_count()
    local = np.asarray(local_rows)
    if global_batch is None or global_batch % n == 0:
        out = np.asarray(multihost_utils.process_allgather(local))
        return out.reshape((-1,) + local.shape[1:])
    per, rem = divmod(global_batch, n)
    perc = per + 1                      # padded common slice size
    pad = np.zeros((perc - len(local),) + local.shape[1:], local.dtype)
    g = np.asarray(multihost_utils.process_allgather(
        np.concatenate([local, pad], axis=0)))      # (n, perc, ...)
    sizes = [per + (1 if j < rem else 0) for j in range(n)]
    return np.concatenate([g[j, :sizes[j]] for j in range(n)], axis=0)


def empty_sharded_table(mesh: Mesh, cfg):
    """Multi-process-safe allocation of the bucket-sharded table.

    `jax.device_put` cannot target another process's devices, so the
    single-controller `sharded.empty_sharded_table` fails under
    `jax.distributed`; `make_array_from_callback` has each process fill
    only its addressable shards.  Works single-process too."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS

    ndev = mesh.devices.size
    assert cfg.n_buckets % ndev == 0
    nloc = cfg.n_buckets // ndev
    table = jax.make_array_from_callback(
        (cfg.n_buckets, cfg.depth), NamedSharding(mesh, PS("d", None)),
        lambda idx: np.zeros((nloc, cfg.depth), np.uint32))
    counts = jax.make_array_from_callback(
        (cfg.n_buckets,), NamedSharding(mesh, PS("d")),
        lambda idx: np.zeros(nloc, np.int32))
    return table, counts
