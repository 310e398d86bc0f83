"""GAN inversion + pivotal tuning of a trained generator onto a real KITTI frame.

Equivalent of reference demo_inversion.py:30-268:
  stage 1: optimize the latent (z | w | w+) [+ per-layer noise, + angular phase] with
           Adam (or spherical Adam) under a cosine-ramped LR schedule;
  stage 2: pivotal tuning — freeze the latent, fine-tune all generator params.
Loss: multiscale masked L1 on depth_norm + inv_depth (reference :166-176), plus a
geocross regularizer for w+.

The per-step optimization is jit-compiled; frames are saved as PNGs/GIF (no cv2 GUI).
The optimized sigmoid(raydrop_logit) map is saved as the per-frame drop map used by the
semseg sim2real pipeline (reference README: GTAV_noise_v2).
"""

import argparse
import os

import numpy as np
import optax

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.datasets.kitti import KITTIRaw
from dusty_gan_v2_tpu.geometry import CoordBridge
from dusty_gan_v2_tpu.inversion import (
    geocross_loss,
    multiscale_masked_loss,
    normalize_noise,
    spherical_project,
    stylegan2_lr_schedule,
)
from dusty_gan_v2_tpu.models import build_generator
from dusty_gan_v2_tpu.models.dusty_v2 import MappingNetwork
from dusty_gan_v2_tpu.pretrained import autoload_ckpt
from dusty_gan_v2_tpu.utils import colorize, init_random_seed, tanh_to_sigmoid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--sample_id", type=int, default=-1)
    parser.add_argument("--latent_type", choices=["z", "w", "w+"], default="w")
    parser.add_argument("--num_steps_1st", type=int, default=500)
    parser.add_argument("--num_steps_2nd", type=int, default=500)
    parser.add_argument("--lr_1st", type=float, default=5e-2)
    parser.add_argument("--lr_2nd", type=float, default=5e-4)
    parser.add_argument("--hypersphere_z", action="store_true")
    parser.add_argument("--optimize_phase", action="store_true")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--out_dir", default="inversion_out")
    parser.add_argument("--seed", type=int, default=0)
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

    # target frame
    ds = KITTIRaw(
        root=args.dataset_root or cfg.dataset.root, split="test", shape=(H, W),
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
    )
    if args.sample_id == -1:
        args.sample_id = int(np.random.randint(len(ds)))
    item = ds[args.sample_id]
    t_depth_m = jnp.asarray(item["depth"][None])
    t_mask = jnp.asarray(item["mask"][None])
    t_depth = coord.convert(t_depth_m, "depth", "depth_norm")
    t_inv = coord.convert(t_depth, "depth_norm", "inv_depth_norm") * t_mask

    # latent init from the w statistics of 10k samples (reference :100-121)
    k1, k2 = jax.random.split(key)
    z_samples = jax.random.normal(k1, (10_000, z_dim))
    mapping = MappingNetwork(**cfg.model.generator.mapping_kwargs)
    w_samples = mapping.apply(
        {"params": g_vars["params"]["mapping_network"]}, z_samples
    )
    w_avg = jnp.mean(w_samples, axis=0, keepdims=True)
    if args.hypersphere_z:
        w_avg = spherical_project(w_avg)

    if args.latent_type == "z":
        latent = jax.random.normal(k2, (1, z_dim))
    elif args.latent_type == "w":
        latent = w_avg
    else:  # w+
        latent = jnp.tile(w_avg[:, None], (1, num_styles, 1))

    phase = jnp.zeros((1, 2, 1, 1))
    # fixed gumbel noise for deterministic raydrop during optimization
    u = np.clip(np.random.rand(1, 1, H, W).astype(np.float32), 1e-6, 1 - 1e-6)
    gumbel_noise = jnp.asarray(np.log(u) - np.log1p(-u))

    def forward(g_variables, latent, phase):
        if args.latent_type == "z":
            w = mapping.apply(
                {"params": g_variables["params"]["mapping_network"]}, latent
            )
            w = jnp.tile(w[:, None], (1, num_styles, 1))
        elif args.latent_type == "w":
            w = jnp.tile(latent[:, None], (1, num_styles, 1))
        else:
            w = latent
        o = G.apply(
            g_variables, w, angle + phase, input_w=True, gumbel_noise=gumbel_noise
        )
        g_inv_orig = tanh_to_sigmoid(o["image_orig"])
        g_depth = coord.convert(g_inv_orig, "inv_depth_norm", "depth_norm")
        loss = multiscale_masked_loss(g_depth, t_depth, t_mask, level=2)
        loss = loss + multiscale_masked_loss(g_inv_orig, t_inv, t_mask, level=2)
        if args.latent_type == "w+":
            loss = loss + 5e-3 * geocross_loss(w)
        return jnp.sum(loss), o

    # ------------------------------------------------------- stage 1: latent
    sched = stylegan2_lr_schedule(args.num_steps_1st)
    opt = optax.adam(args.lr_1st)
    opt_state = opt.init({"latent": latent, "phase": phase})

    @jax.jit
    def step1(latent, phase, opt_state, lr_scale):
        def loss_fn(p):
            return forward(g_vars, p["latent"], p["phase"])

        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            {"latent": latent, "phase": phase}
        )
        if not args.optimize_phase:
            grads["phase"] = jnp.zeros_like(grads["phase"])
        updates, new_opt = opt.update(grads, opt_state)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        p = optax.apply_updates({"latent": latent, "phase": phase}, updates)
        lat = p["latent"]
        if args.hypersphere_z:
            lat = spherical_project(lat)
        return lat, p["phase"], new_opt, loss

    for step in range(args.num_steps_1st):
        latent, phase, opt_state, loss = step1(
            # numpy scalar: an eager jnp.asarray would cost one device round-trip
            # per optimization step on tunnel-attached TPUs
            latent, phase, opt_state, np.float32(sched(step))
        )
        if step % 100 == 0:
            print(f"[1] step {step:4d} loss {float(loss):.5f}")

    # ------------------------------------------------------- stage 2: pivotal tuning
    opt2 = optax.adam(args.lr_2nd)
    params_G = g_vars["params"]
    opt2_state = opt2.init(params_G)

    @jax.jit
    def step2(params_G, opt2_state):
        def loss_fn(p):
            gv = dict(g_vars)
            gv["params"] = p
            return forward(gv, latent, phase)

        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_G)
        updates, new_opt = opt2.update(grads, opt2_state)
        return optax.apply_updates(params_G, updates), new_opt, loss, o

    o = None
    for step in range(args.num_steps_2nd):
        params_G, opt2_state, loss, o = step2(params_G, opt2_state)
        if step % 100 == 0:
            print(f"[2] step {step:4d} loss {float(loss):.5f}")

    # ------------------------------------------------------- outputs
    os.makedirs(args.out_dir, exist_ok=True)
    final_vars = dict(g_vars)
    final_vars["params"] = params_G
    _, o = jax.jit(lambda: forward(final_vars, latent, phase))()
    raydrop_prob = jax.nn.sigmoid(o["raydrop_logit"])
    np.save(
        os.path.join(args.out_dir, f"raydrop_prob_{args.sample_id:010d}.npy"),
        np.asarray(raydrop_prob[0, 0]),
    )
    panels = [
        np.asarray(colorize(t_inv)),
        np.asarray(colorize(tanh_to_sigmoid(o["image_orig"]).clip(0, 1))),
        np.asarray(colorize(raydrop_prob)),
        np.asarray(colorize(tanh_to_sigmoid(o["image"]).clip(0, 1))),
    ]
    grid = np.concatenate([p[0].transpose(1, 2, 0) for p in panels], axis=0)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(os.path.join(args.out_dir, f"summary_{args.sample_id:010d}.png"), grid)
    print("saved outputs to", args.out_dir)


if __name__ == "__main__":
    main()
