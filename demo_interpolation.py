"""Latent-space interpolation demo: smooth cubic path through mapped anchors.

Equivalent of reference demo_interpolation.py:20-167. This environment has no GUI, so:
  --mode 2d renders colorized range-image frames to a GIF;
  --mode 3d exports interpolated point clouds (+surface-normal colors) as .npz frames
            (the reference used a live polyscope viewer).

    python demo_interpolation.py --ckpt_path <ckpt> --mode 2d --out interp.gif
"""

import argparse

import numpy as np
import scipy.interpolate

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.geometry import CoordBridge
from dusty_gan_v2_tpu.models import build_generator
from dusty_gan_v2_tpu.models.dusty_v2 import MappingNetwork
from dusty_gan_v2_tpu.pretrained import autoload_ckpt
from dusty_gan_v2_tpu.utils import colorize, init_random_seed, tanh_to_sigmoid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--mode", choices=["2d", "3d"], default="2d")
    parser.add_argument("--num_anchors", type=int, default=10)
    parser.add_argument("--frames_per_anchor", type=int, default=30)
    parser.add_argument("--truncation_psi", type=float, default=0.7)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="interp.gif")
    args = parser.parse_args()

    key = init_random_seed(args.seed)
    ckpt = autoload_ckpt(args.ckpt_path)
    cfg = ckpt["cfg"]
    H, W = cfg.model.generator.synthesis_kwargs.resolution
    coord = CoordBridge(
        num_ring=H, num_points=W,
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        angle=np.asarray(ckpt["angle"]),
    )
    angle = jnp.asarray(ckpt["angle"])
    G = build_generator(cfg.model.generator)
    g_vars = ckpt["G_ema"]
    z_dim = cfg.model.generator.mapping_kwargs.in_ch
    num_styles = 2 * (len(cfg.model.generator.synthesis_kwargs.layers) + 1)

    # anchors on the z hypersphere, mapped to w (reference :144-151)
    zs = jax.random.normal(key, (args.num_anchors, z_dim))
    zs = zs / jnp.sqrt(jnp.mean(zs**2, axis=-1, keepdims=True) + 1e-8)
    mapping = MappingNetwork(**cfg.model.generator.mapping_kwargs)
    ws = mapping.apply({"params": g_vars["params"]["mapping_network"]}, zs)
    ws = np.asarray(ws)

    interp = scipy.interpolate.interp1d(
        x=np.arange(-args.num_anchors * 2, args.num_anchors * 3),
        y=np.tile(ws, [5] + [1] * (ws.ndim - 1)),
        kind="cubic",
        axis=0,
    )
    steps = np.linspace(0, args.num_anchors, args.num_anchors * args.frames_per_anchor,
                        endpoint=False)

    # deterministic gumbel (reference fixed-noise hook)
    u = np.clip(np.random.rand(1, 1, H, W).astype(np.float32), 1e-6, 1 - 1e-6)
    gumbel_noise = jnp.asarray(np.log(u) - np.log1p(-u))

    @jax.jit
    def generate(w):
        w_all = jnp.tile(w[:, None], (1, num_styles, 1))
        return G.apply(
            g_vars, w_all, angle, input_w=True,
            truncation_psi=args.truncation_psi, gumbel_noise=gumbel_noise,
        )

    frames = []
    clouds = []
    for t in steps:
        w = jnp.asarray(interp(t)[None], jnp.float32)
        o = generate(w)
        if args.mode == "2d":
            panels = [tanh_to_sigmoid(o["image"]).clip(0, 1)]
            if "image_orig" in o:
                panels = [
                    tanh_to_sigmoid(o["image_orig"]).clip(0, 1),
                    jax.nn.sigmoid(o["raydrop_logit"]),
                ] + panels
            strip = jnp.concatenate(panels, axis=2)
            rgb = np.asarray(colorize(strip))[0].transpose(1, 2, 0)
            frames.append((rgb * 255).astype(np.uint8))
        else:
            inv = tanh_to_sigmoid(o["image"]).clip(0, 1)
            pm = coord.convert(inv, "inv_depth_norm", "point_map")
            nm = coord.convert(pm, "point_map", "normal_map")
            clouds.append(
                {
                    "points": np.asarray(pm)[0].reshape(3, -1).T,
                    "normals": np.asarray(nm)[0].reshape(3, -1).T,
                }
            )

    if args.mode == "2d":
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            args.out, save_all=True, append_images=imgs[1:], duration=33, loop=0
        )
        print(f"saved {len(frames)} frames -> {args.out}")
    else:
        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        np.savez_compressed(
            out,
            points=np.stack([c["points"] for c in clouds]),
            normals=np.stack([c["normals"] for c in clouds]),
        )
        print(f"saved {len(clouds)} point-cloud frames -> {out}")


if __name__ == "__main__":
    main()
