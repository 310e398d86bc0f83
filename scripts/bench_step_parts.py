"""Decompose the training-step wall-clock: which component eats the time?

Each part runs REPS times inside one jitted lax.fori_loop (serialized via a data
dependence) and the result is fetched to host — the only reliable timing pattern
on the tunneled-TPU setup, where per-dispatch latency is tens of ms and
block_until_ready under-reports for queued small programs.

    python scripts/bench_step_parts.py [--dtype float32] [--batch 32]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPS = 10


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from dusty_gan_v2_tpu.augment.ada import AdaptiveAugment
    from dusty_gan_v2_tpu.models import build_discriminator, build_generator
    from dusty_gan_v2_tpu.utils.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/gans/dusty_v2.yaml")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    cfg = load_config(args.config)
    cfg.model.generator.compute_dtype = args.dtype
    cfg.model.discriminator.layer_kwargs.compute_dtype = args.dtype
    res = tuple(cfg.model.generator.synthesis_kwargs.resolution)
    B = args.batch

    G = build_generator(cfg.model.generator)
    D = build_discriminator(cfg.model.discriminator)
    ada = AdaptiveAugment(p_init=0.5, p_target=0.6, kimg=500,
                          **cfg.training.augment.policy)

    elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
    azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
    angle = jnp.asarray(np.stack(np.meshgrid(elev, azim, indexing="ij"), 0)[None])

    kg = jax.random.PRNGKey(0)
    z = jax.random.normal(kg, (B, cfg.model.generator.mapping_kwargs.in_ch))
    # init on the accelerator (compiles are persistent-cached; CPU-device compiles
    # are avoided — the remote compile helper produces host-mismatched CPU AOT blobs)
    gv = G.init({"params": kg, "gumbel": jax.random.fold_in(kg, 1)},
                jnp.zeros((2, z.shape[1])), angle)
    dv = D.init(kg, jnp.zeros((2, 1, *res)))
    x = jax.random.normal(jax.random.fold_in(kg, 2), (B, 1, *res))

    def rngs(k):
        ks = jax.random.split(k, 4)
        return {"gumbel": ks[0], "noise": ks[1], "styles": ks[2], "aug": ks[3]}

    def g_fwd(z, k, train):
        if train:
            o, _ = G.apply(gv, z, angle, rngs=rngs(k), train=True, mutable=["stats"])
        else:
            o = G.apply(gv, z, angle, rngs=rngs(k))
        return o["image"]

    def g_loss(z, k):
        img = g_fwd(z, k, True)
        img = ada(img, jnp.asarray(0.5), jax.random.fold_in(k, 9))
        y = D.apply(dv, img)
        return jnp.mean(jax.nn.softplus(-y))

    def d_loss(x):
        return jnp.mean(jax.nn.softplus(D.apply(dv, x)))

    k0 = jax.random.PRNGKey(7)

    def loop(fn):
        """Run fn REPS times serialized on a scalar carry, return final scalar."""

        def body(i, s):
            return fn(s, jax.random.fold_in(k0, i))

        return jax.jit(lambda: jax.lax.fori_loop(0, REPS, body, jnp.float32(0)))

    parts = {
        "G fwd (eval)": loop(lambda s, k: jnp.mean(g_fwd(z + s * 0, k, False))),
        "G fwd (train)": loop(lambda s, k: jnp.mean(g_fwd(z + s * 0, k, True))),
        "ADA augment": loop(lambda s, k: jnp.mean(ada(x + s * 0, jnp.asarray(0.5), k))),
        "D fwd": loop(lambda s, k: jnp.mean(D.apply(dv, x + s * 0))),
        "D fwd+bwd": loop(lambda s, k: jnp.mean(jax.grad(d_loss)(x + s * 0))),
        "G loss fwd (G+ADA+D)": loop(lambda s, k: g_loss(z + s * 0, k)),
        "G phase grad (wrt z)": loop(
            lambda s, k: jnp.mean(jax.grad(lambda zz: g_loss(zz, k))(z + s * 0))
        ),
    }

    for name, f in parts.items():
        o = f()
        _ = float(o)  # compile+run, host sync
        t0 = time.perf_counter()
        _ = float(f())
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:>24}: {1e3 * dt:8.2f} ms")


if __name__ == "__main__":
    main()
