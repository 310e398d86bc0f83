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
