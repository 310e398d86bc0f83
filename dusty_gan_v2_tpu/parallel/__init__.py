from .mesh import (
    DATA_AXIS,
    data_sharding,
    global_batch,
    init_distributed,
    local_batch,
    make_mesh,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "data_sharding",
    "global_batch",
    "init_distributed",
    "local_batch",
    "make_mesh",
    "replicated",
]
