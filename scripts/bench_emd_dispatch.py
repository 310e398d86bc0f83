"""Quantify the 1-NNA-EMD at-scale vs microbench gap (r4: 1441.6 vs 2207 pairs/s).

The r4 protocol run drove `_pairwise_distance` exactly as shipped (r2 design:
host-assembled (chunk,) index vectors device_put per chunk) and measured 35%
below the kernel microbench. Suspects, each isolated here on real at-scale
state (two replicated 2048x2048x3 cloud sets, production `compute_emd` path):

  host_idx_256   — the r2 formulation at the protocol chunk (256)
  dev_idx_256    — indices computed on device from ONE int32 scalar per chunk
  dev_idx_1024   — same, 4x fewer dispatches
  dev_idx_2048   — same, 8x fewer dispatches (one grid row per dispatch)

Each config times `--chunks_per_cfg` chunk dispatches with one final
block_until_ready (the protocol's own pipelining pattern) and reports pairs/s.

    python scripts/bench_emd_dispatch.py [--chunks_per_cfg 64]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dusty_gan_v2_tpu.metrics.cov_mmd_1nna import _FNS
    from dusty_gan_v2_tpu.parallel import DATA_AXIS, make_mesh

    p = argparse.ArgumentParser()
    p.add_argument("--num_subsample", type=int, default=2048)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--chunks_per_cfg", type=int, default=64)
    args = p.parse_args()

    B = args.num_subsample
    total = B * B
    f = _FNS["emd"]
    mesh = make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    rng = np.random.RandomState(0)
    p1 = jax.device_put(rng.rand(B, args.num_points, 3).astype(np.float32), repl)
    p2 = jax.device_put(rng.rand(B, args.num_points, 3).astype(np.float32), repl)
    jax.block_until_ready((p1, p2))

    results = {}

    def time_cfg(name, dispatch_one, chunk):
        n = args.chunks_per_cfg
        # warmup/compile on an off-range start. Fence via a DATA FETCH of the
        # last chunk (in-order execution implies all prior chunks completed):
        # block_until_ready was observed returning without fencing execution on
        # this tunnel under queue congestion (r5).
        np.asarray(dispatch_one(total - chunk))
        t0 = time.time()
        last = None
        for i in range(n):
            last = dispatch_one(i * chunk)
        np.asarray(last)
        dt = time.time() - t0
        rate = n * chunk / dt
        results[name] = round(rate, 1)
        print(json.dumps({"cfg": name, "chunk": chunk, "chunks": n,
                          "sec": round(dt, 2), "pairs_per_s": round(rate, 1)}),
              flush=True)

    # --- r2 formulation: host indices, device_put per chunk ---
    chunk0 = max(n_dev, (256 // n_dev) * n_dev)
    jit_host = jax.jit(lambda pa, pb, ii, jj: f(pa[ii], pb[jj]))

    def host_idx(start):
        idx = np.arange(start, min(start + chunk0, total))
        ii, jj = idx // B, idx % B
        return jit_host(p1, p2, jax.device_put(ii, sharding),
                        jax.device_put(jj, sharding))

    time_cfg("host_idx_256", host_idx, chunk0)

    # --- device-side indices from one scalar, several chunk sizes ---
    for chunk in (256, 1024, 2048):
        chunk_n = max(n_dev, (chunk // n_dev) * n_dev)

        @jax.jit
        def jit_dev(pa, pb, start, _c=chunk_n):
            idx = start + jnp.arange(_c, dtype=jnp.int32)
            idx = jnp.minimum(idx, total - 1)
            idx = jax.lax.with_sharding_constraint(idx, sharding)
            return f(pa[idx // B], pb[idx % B])

        time_cfg(f"dev_idx_{chunk}", lambda s, j=jit_dev: j(p1, p2, np.int32(s)),
                 chunk_n)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
