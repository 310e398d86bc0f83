"""Decompose the training-step wall-clock: which component eats the time?

Times each piece of the adv step in isolation at the full 64x512 config
(B=32, fp32): G fwd, G fwd+bwd, D fwd, D fwd+bwd, ADA augment, fused G-phase,
fused D-phase. Used to target kernel/fusion work (BASELINE.md notes).
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

    from dusty_gan_v2_tpu.augment.ada import AdaptiveAugment
    from dusty_gan_v2_tpu.models import build_discriminator, build_generator
    from dusty_gan_v2_tpu.utils.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/gans/dusty_v2.yaml")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--iters", type=int, default=20)
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
    gv = G.init({"params": kg, "gumbel": jax.random.fold_in(kg, 1)}, z, angle)
    x = jax.random.normal(jax.random.fold_in(kg, 2), (B, 1, *res))
    dv = D.init(kg, x)

    def rngs(k):
        ks = jax.random.split(k, 4)
        return {"gumbel": ks[0], "noise": ks[1], "styles": ks[2], "aug": ks[3]}

    def g_fwd(gv, z, k):
        o, _ = G.apply(gv, z, angle, rngs=rngs(k), train=True, mutable=["stats"])
        return o["image"]

    def g_loss(gv, z, k):
        img = g_fwd(gv, z, k)
        img = ada(img, jnp.asarray(0.5), jax.random.fold_in(k, 9))
        y = D.apply(dv, img)
        return jnp.mean(jax.nn.softplus(-y))

    def d_loss(dv, x):
        y = D.apply(dv, x)
        return jnp.mean(jax.nn.softplus(y))

    parts = {
        "G fwd": jax.jit(lambda gv, z, k: g_fwd(gv, z, k)),
        "G fwd+ADA+D fwd (G loss)": jax.jit(g_loss),
        "G phase bwd (grad wrt G)": jax.jit(jax.grad(g_loss)),
        "D fwd": jax.jit(lambda dv, x: D.apply(dv, x)),
        "D fwd+bwd": jax.jit(jax.grad(d_loss)),
        "ADA augment alone": jax.jit(
            lambda x, k: ada(x, jnp.asarray(0.5), k)
        ),
    }

    def bench(name, fn, *fargs):
        o = fn(*fargs)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.iters):
            outs.append(fn(*fargs))
        jax.block_until_ready(outs)
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        _ = np.asarray(leaf.ravel()[0])  # force true sync through host fetch
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>28}: {1e3 * dt:8.2f} ms")

    k = jax.random.PRNGKey(7)
    bench("G fwd", parts["G fwd"], gv, z, k)
    bench("G fwd+ADA+D fwd (G loss)", parts["G fwd+ADA+D fwd (G loss)"], gv, z, k)
    bench("G phase bwd (grad wrt G)", parts["G phase bwd (grad wrt G)"], gv, z, k)
    bench("D fwd", parts["D fwd"], dv, x)
    bench("D fwd+bwd", parts["D fwd+bwd"], dv, x)
    bench("ADA augment alone", parts["ADA augment alone"], x, k)


if __name__ == "__main__":
    main()
