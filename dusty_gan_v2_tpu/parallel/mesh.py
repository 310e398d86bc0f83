"""Device-mesh helpers for SPMD data-parallel training.

The reference's parallelism is single-axis data parallelism over NCCL DDP
(SURVEY.md §2.5). The TPU-native equivalent: one `jax.sharding.Mesh` with a "data"
axis; parameters replicated, batches sharded, gradients/statistics reduced with
`jax.lax.psum` over ICI (jax.distributed handles multi-host DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "DATA_AXIS", "local_batch"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    assert global_batch % n == 0, f"batch {global_batch} not divisible by {n} devices"
    return global_batch // n


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous: `jax.distributed.initialize` (the TPU-native analogue of
    the reference's NCCL file-store rendezvous, gans/utils.py:33-42).

    With no arguments, cluster parameters are auto-detected from the environment
    (TPU pod metadata / SLURM / JAX_COORDINATOR_ADDRESS). Must run before the first
    device query. Safe to call when already initialized (no-op).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def global_batch(mesh: Mesh, host_batch: dict, axis_name: str = DATA_AXIS) -> dict:
    """Assemble a *globally sharded* batch from each process's host-local arrays.

    Every process passes its own slice (global_batch_size / process_count rows); the
    result is a dict of jax.Arrays sharded over the data axis spanning all hosts —
    what the jitted shard_map train step consumes (the reference splits the batch
    across DDP ranks instead, train_gan.py:180-184). Works unchanged single-process
    (equivalent to a device_put with the batch sharding).
    """
    sharding = data_sharding(mesh, axis_name)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in host_batch.items()
    }
