"""Worker for the 2-process jax.distributed integration test.

Each process: initialize the local cluster, build the global data mesh (2 procs x
2 virtual CPU devices), assemble its half of a global batch via
parallel.global_batch, run a psum'd shard_map step, and print the reduced value —
which depends on BOTH processes' data, proving cross-process collectives work.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dusty_gan_v2_tpu.parallel import (
    DATA_AXIS,
    global_batch,
    init_distributed,
    make_mesh,
)

init_distributed(f"localhost:{port}", num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 2 * num_procs, jax.device_count()

import numpy as np

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = make_mesh()  # all 4 global devices on the data axis

# each process contributes 2 rows (one per local device) of a 4-row global batch
local = {"x": np.arange(2, dtype=np.float32)[:, None] + 10.0 * proc_id + 1.0}
batch = global_batch(mesh, local)
assert batch["x"].shape == (2 * num_procs, 1)


@jax.jit
def step(b):
    f = shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), DATA_AXIS),
        mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
    )
    return f(b["x"])


total = float(step(batch))
# rows: proc0 -> [1, 2], proc1 -> [11, 12]; global sum = 26
print(f"RESULT proc={proc_id} total={total}", flush=True)
assert total == 26.0, total
