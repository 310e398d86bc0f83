"""Measure the cost of concat-based ring/replicate padding in the discriminator.

Every RingConv2d pre-pads its input (circular W / replicate H, ops/pad.py) before a
VALID conv; the concat may be materialized by XLA instead of fused into the conv's
own zero-padding path. This script A/Bs the full D fwd+bwd (the dominant D-phase
cost) against a patched build where `_pad_axis` is zero padding via lax.pad — which
XLA's simplifier folds into the convolution — isolating the padding materialization
tax. The zero-pad variant is NOT numerically equivalent; timing only.

    python scripts/bench_ringpad.py [--batch 32] [--dtype float32] [--iters 20]
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

    from dusty_gan_v2_tpu.models.builder import build_discriminator
    from dusty_gan_v2_tpu.utils.config import load_config
    import dusty_gan_v2_tpu.ops.pad as pad_mod

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/gans/dusty_v2.yaml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    cfg = load_config(args.config)
    dcfg = cfg.model.discriminator.to_dict()
    dcfg.setdefault("compute_dtype", args.dtype)

    H, W = cfg.model.generator.synthesis_kwargs.resolution
    rng = np.random.RandomState(0)
    in_ch = int(dcfg.get("in_ch", 1))
    x = jnp.asarray(rng.randn(args.batch, in_ch, H, W).astype(np.float32))

    def build_and_time(tag):
        model = build_discriminator(dcfg)
        params = model.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def step(p, xx):
            def loss(pp, xi):
                return jnp.mean(model.apply(pp, xi))

            l, (gp, gx) = jax.value_and_grad(
                lambda pp, xi: loss(pp, xi), argnums=(0, 1)
            )(p, xx)
            return l, gx

        l, gx = step(params, x)
        jax.block_until_ready(gx)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            l, gx = step(params, x)
        jax.block_until_ready(gx)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{tag}: D fwd+bwd {dt:.2f} ms @ B={args.batch} {args.dtype}")
        return dt

    t_ring = build_and_time("production (ring/replicate concat pad)")

    orig = pad_mod._pad_axis

    def zero_pad_axis(xx, axis, lo, hi, mode):
        return orig(xx, axis, lo, hi, "zeros")

    pad_mod._pad_axis = zero_pad_axis
    try:
        t_zero = build_and_time("patched (all pads -> lax.pad zeros)")
    finally:
        pad_mod._pad_axis = orig
    print(f"padding tax: {t_ring - t_zero:.2f} ms ({100*(t_ring-t_zero)/t_ring:.1f}%)")


if __name__ == "__main__":
    main()
