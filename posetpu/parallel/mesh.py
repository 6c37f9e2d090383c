"""Device mesh + sharding helpers.

The reference scales with one-process-per-GPU NCCL DDP (run/pose2d/train.py:
129-225). The TPU-native equivalent is a 1-D ``data`` mesh over ICI with
batch-sharded inputs and replicated parameters; the gradient allreduce is
implicit in jit's partitioning, and eval gathers ride the same mesh
(SURVEY.md rows 24-26: the reference has data parallelism only — there is no
TP/PP/SP/EP to reproduce, so the mesh stays 1-D by design).

Multi-host: call :func:`initialize_distributed` first (maps to
``jax.distributed.initialize``), then the same code runs unchanged — the mesh
simply spans all processes' devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host rendezvous (the NCCL init_process_group equivalent,
    train.py:133-135). No-op on a single host with no coordinator given."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator, num_processes, process_id)


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ('data',) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for any pytree leaf."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate params/state across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def shard_host_batch(batch, mesh: Mesh):
    """Per-process host batch -> global batch sharded on axis 0.

    Single process: a plain sharded device_put. Multi-process (multi-host
    TPU): each process contributes its local shard of the global batch
    (``jax.make_array_from_process_local_data``) — the loader must be sharded
    with num_shards=process_count so locals concatenate to the global batch,
    mirroring the reference's DistributedSampler split
    (lib/utils/utils.py:134-141)."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
    )


def local_data(arr) -> np.ndarray:
    """Process-local rows of a (possibly multi-process) batch-sharded array.

    ``np.asarray`` on a global array that spans non-addressable devices
    raises in multi-controller JAX; this concatenates the addressable
    axis-0 shards instead (order by global offset). Fully-addressable
    arrays pass straight through."""
    if not hasattr(arr, "addressable_shards") or getattr(
        arr, "is_fully_addressable", True
    ):
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def global_batch_from_full_host(batch, mesh: Mesh):
    """Identical full host batch on EVERY process -> batch-sharded global
    arrays. Used by validate, where all processes iterate the full test set
    in lockstep (collective-safe: every process participates in the eval
    step's compute and gather; only process 0 writes outputs)."""
    s = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, batch)
