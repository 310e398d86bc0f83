"""FPS wall-clock: XLA lax.scan vs batched Pallas kernel, plus exact parity.

    python scripts/bench_fps.py [--batch 64] [--n 32768] [--k 2048]

(Eval context: test_gan downsamples every generated/real cloud 32768 -> 2048 pts;
at 50k samples this is ~190 s of the protocol with the XLA scan.)
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

    from dusty_gan_v2_tpu.metrics.fps import furthest_point_sampling
    from dusty_gan_v2_tpu.metrics.pallas_fps import fps_pallas

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=32768)
    p.add_argument("--k", type=int, default=2048)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32))

    ref = np.asarray(jax.jit(lambda x: furthest_point_sampling(x, args.k))(xyz))
    got = np.asarray(jax.jit(lambda x: fps_pallas(x, args.k))(xyz))
    print(f"parity: exact index match = {bool((ref == got).all())} "
          f"({(ref == got).mean():.4f} agree)")

    for name, fn in (("xla_scan", lambda x: furthest_point_sampling(x, args.k)),
                     ("pallas", lambda x: fps_pallas(x, args.k))):
        f = jax.jit(fn)
        o = f(xyz)
        _ = np.asarray(o[0, 0])
        t0 = time.perf_counter()
        for _i in range(args.iters):
            o = f(xyz)
        _ = np.asarray(o[0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>9}: {1e3 * dt:8.2f} ms / {args.batch} clouds "
              f"({1e3 * dt / args.batch:6.3f} ms/cloud) -> 50k-sample eval "
              f"~= {50e3 / args.batch * dt:.0f}s")


if __name__ == "__main__":
    main()
