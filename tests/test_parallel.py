"""Multi-host data-parallel math: rank-sharded sampler + global batch assembly.

(Real multi-process jax.distributed isn't exercisable on this box; these tests pin
the per-process semantics the wiring in train_gan.py relies on — reference
counterparts: gans/utils.py:238-271 InfiniteSampler rank sharding and
train_gan.py:180-184 batch splitting.)
"""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.datasets.kitti import InfiniteSampler
from dusty_gan_v2_tpu.parallel import (
    DATA_AXIS,
    data_sharding,
    global_batch,
    make_mesh,
)


def take(it, n):
    return list(itertools.islice(it, n))


class TestSamplerRankSharding:
    def test_ranks_interleave_one_global_stream(self):
        """R rank-sharded samplers with the same seed must interleave exactly the
        num_replicas=1 stream (the reference's `idx % num_replicas == rank`)."""
        size, R, n = 37, 4, 64
        full = take(iter(InfiniteSampler(size, seed=3)), n * R)
        streams = [
            take(iter(InfiniteSampler(size, rank=r, num_replicas=R, seed=3)), n)
            for r in range(R)
        ]
        interleaved = [streams[k % R][k // R] for k in range(n * R)]
        assert interleaved == full

    def test_disjoint_per_step(self):
        """Within one global batch (one index per rank), ranks see distinct items
        (as long as dataset_size >= num_replicas)."""
        size, R = 1024, 8
        firsts = [
            take(iter(InfiniteSampler(size, rank=r, num_replicas=R, seed=0)), 16)
            for r in range(R)
        ]
        for step in range(16):
            batch = [firsts[r][step] for r in range(R)]
            assert len(set(batch)) == R

    def test_coverage(self):
        """The union over ranks covers the dataset (no starved indices)."""
        size, R = 16, 4
        seen = set()
        for r in range(R):
            seen.update(take(iter(InfiniteSampler(size, rank=r, num_replicas=R,
                                                  seed=1)), 4 * size))
        assert seen == set(range(size))


class TestGlobalBatch:
    def test_single_process_sharding(self):
        mesh = make_mesh()
        n = mesh.shape[DATA_AXIS]
        raw = {
            "depth": np.arange(n * 2 * 6, dtype=np.float32).reshape(n * 2, 1, 2, 3),
            "mask": np.ones((n * 2, 1, 2, 3), np.float32),
        }
        out = global_batch(mesh, raw)
        assert out["depth"].shape == raw["depth"].shape
        assert out["depth"].sharding.is_equivalent_to(data_sharding(mesh), 4)
        np.testing.assert_array_equal(np.asarray(out["depth"]), raw["depth"])

    def test_feeds_sharded_jit(self):
        mesh = make_mesh()
        n = mesh.shape[DATA_AXIS]
        raw = {"x": np.random.RandomState(0).randn(n * 4, 8).astype(np.float32)}
        out = global_batch(mesh, raw)

        got = jax.jit(lambda b: jnp.sum(b["x"] ** 2))(out)
        np.testing.assert_allclose(float(got), (raw["x"] ** 2).sum(), rtol=1e-6)


class TestTwoProcessCluster:
    def test_jax_distributed_psum_across_processes(self, tmp_path):
        """Real multi-process integration: 2 local processes x 2 virtual CPU devices
        form one jax.distributed cluster; parallel.global_batch assembles a global
        array from per-process halves and a shard_map psum reduces across BOTH
        processes (the reference's NCCL all-reduce, gans/utils.py:33-42)."""
        import socket
        import subprocess
        import sys as _sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        worker = str(
            __import__("pathlib").Path(__file__).parent / "distributed_worker.py"
        )
        env = dict(__import__("os").environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs = [
            subprocess.Popen(
                [_sys.executable, worker, str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
        for i, out in enumerate(outs):
            assert f"RESULT proc={i} total=26.0" in out, out[-2000:]
