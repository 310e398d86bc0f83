"""Sample a pretrained generator and save a colorized range-image grid.

Equivalent of reference quick_demo.py:11-41 (CPU-runnable; works with released .pth
checkpoints via on-the-fly conversion, or with our native checkpoints).

    python quick_demo.py --arch dusty_v2 [--ckpt_path path] [--out demo.png]
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.models import build_generator
from dusty_gan_v2_tpu.pretrained import PRETRAINED_CKPTS, autoload_ckpt
from dusty_gan_v2_tpu.utils import colorize, init_random_seed, tanh_to_sigmoid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--arch", default=None,
        help=f"pretrained keyword {list(PRETRAINED_CKPTS)} or a checkpoint path",
    )
    parser.add_argument("--ckpt_path", default=None, help="alias of --arch for paths")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--truncation_psi", type=float, default=0.7)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="quick_demo.png")
    args = parser.parse_args()

    key = init_random_seed(args.seed)
    ckpt = autoload_ckpt(args.ckpt_path or args.arch)
    cfg = ckpt["cfg"]
    z_dim = cfg.model.generator.mapping_kwargs.in_ch

    G = build_generator(cfg.model.generator)
    variables = ckpt["G_ema"]
    angle = jnp.asarray(ckpt["angle"])

    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (args.batch_size, z_dim))
    out = jax.jit(
        lambda v, z: G.apply(
            v, z, angle, truncation_psi=args.truncation_psi,
            rngs={"gumbel": k2, "noise": jax.random.fold_in(k2, 1)},
        )
    )(variables, z)

    img = tanh_to_sigmoid(out["image"]).clip(0, 1)
    colored = np.asarray(colorize(img, "turbo"))  # (B,3,H,W)
    B, _, H, W = colored.shape
    rows = [
        np.concatenate(list(colored[i : i + 2].transpose(0, 2, 3, 1)), axis=1)
        for i in range(0, B, 2)
    ]
    grid = np.concatenate(rows, axis=0)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(args.out, grid)
    print(f"saved: {args.out}  images: {out['image'].shape}")


if __name__ == "__main__":
    main()
