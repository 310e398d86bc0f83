"""EMD wall-clock: XLA fused scan vs Pallas K-resident kernel, plus parity.

    python scripts/bench_emd.py [--batch 64] [--n 2048]

Produces the ms/64-pairs table for BASELINE.md (reference note: 1-NNA-EMD "> 1h"
on its GPUs, test_gan.py:228-229).
"""

import argparse
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

    from dusty_gan_v2_tpu.metrics.distance import earth_mover_distance
    from dusty_gan_v2_tpu.metrics.pallas_emd import emd_pallas

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    # unit-sphere-ish clouds like the eval protocol (points / max_depth, then /2)
    x = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32) * 0.3)
    y = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32) * 0.3)

    xla_fn = jax.jit(earth_mover_distance)
    pls_fn = jax.jit(emd_pallas)

    ref = np.asarray(xla_fn(x, y))
    got = np.asarray(pls_fn(x, y))
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9)
    print(f"parity: max rel diff = {rel.max():.3e}")

    for name, fn in (("xla_scan", xla_fn), ("pallas", pls_fn)):
        out = fn(x, y)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x, y)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>9}: {1e3 * dt:8.2f} ms / {args.batch} pairs "
              f"({1e3 * dt / args.batch:6.3f} ms/pair) -> full 2048x2048x3 1-NNA-EMD "
              f"~= {3 * 2048 * 2048 * dt / args.batch / 3600:.2f} h")


if __name__ == "__main__":
    main()
