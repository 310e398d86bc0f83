"""Evaluate a trained GAN: SWD / JSD / COV-MMD-1NNA (CD/EMD/DCD) / FPD / KPD.

Equivalent of reference test_gan.py:26-258, single-controller: generation, feature
extraction, and the metric math all run batched on the accelerator (deterministic
gumbel via a fixed logistic noise map, like the reference's forward hook, :96-100);
only final scalars leave the device.

The default metric list matches the reference protocol exactly (test_gan.py:259:
swd,jsd,1nna[EMD],fpd,kpd — one invocation). The EMD stage is the expensive one
(the reference notes "> 1h" on all its GPUs; ~1.6 h on one v5e chip, /n on a mesh);
pass --metrics swd,jsd,1nna-cd,fpd,kpd for the fast CD variant (~7 min total).

    python test_gan.py --ckpt_path <ckpt> [--metrics swd,jsd,1nna-cd,fpd,kpd]
"""

import argparse
import json
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.datasets.kitti import KITTIRaw, Prefetcher
from dusty_gan_v2_tpu.geometry import CoordBridge
from dusty_gan_v2_tpu.metrics import (
    compute_cov_mmd_1nna,
    compute_frechet_distance,
    compute_jsd,
    compute_squared_mmd,
    compute_swd,
    downsample_point_clouds,
    load_torch_state_dict,
    pointnet_features,
)
from dusty_gan_v2_tpu.models import build_generator
from dusty_gan_v2_tpu.pretrained import autoload_ckpt
from dusty_gan_v2_tpu.utils import init_random_seed, sigmoid_to_tanh, tanh_to_sigmoid


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--metrics", default="swd,jsd,1nna-emd,fpd,kpd",
                        help="comma list: swd,jsd,fpd,kpd,1nna-cd,1nna-emd,1nna-dcd "
                             "(default = the reference protocol; 1nna-emd is the "
                             ">1h stage — use 1nna-cd for a fast pass)")
    parser.add_argument("--num_samples", type=int, default=50_000)
    parser.add_argument("--num_subsample", type=int, default=2048)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--pairwise_batch", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pointnet_ckpt", default=None)
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--prune_missing", action="store_true",
                        help="skip split-table frames absent on disk (partial / "
                             "synthetic datasets); defaults to the ckpt cfg value")
    parser.add_argument("--out", default=None, help="write scores JSON here")
    args = parser.parse_args()
    metrics = args.metrics.split(",")
    if "1nna-emd" in metrics:
        print(
            "[test_gan] NOTE: 1nna-emd (in the default metric set to match the "
            "reference protocol, reference test_gan.py:228-237) is the '>1h' stage "
            "at the full 2048x2048 protocol on one chip; pass "
            "--metrics swd,jsd,1nna-cd,fpd,kpd for the documented fast pass.",
            flush=True,
        )

    init_random_seed(args.seed)
    ckpt = autoload_ckpt(args.ckpt_path)
    cfg = ckpt["cfg"]
    H, W = cfg.model.generator.synthesis_kwargs.resolution
    angle = jnp.asarray(ckpt["angle"])
    num_points = int(cfg.validation.num_points)

    coord = CoordBridge(
        num_ring=H, num_points=W,
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        angle=np.asarray(ckpt["angle"]),
    )
    G = build_generator(cfg.model.generator)
    g_vars = ckpt["G_ema"]
    z_dim = cfg.model.generator.mapping_kwargs.in_ch

    need_feats = any(m in metrics for m in ("fpd", "kpd"))
    pointnet_params = None
    if need_feats:
        assert args.pointnet_ckpt, "--pointnet_ckpt required for fpd/kpd"
        if args.pointnet_ckpt == "random":
            # pipeline/timing runs without the SpareNet release file (zero-egress
            # environments): feature VALUES are meaningless, wall-clock is real
            from dusty_gan_v2_tpu.metrics import init_pointnet_params

            pointnet_params = init_pointnet_params(jax.random.PRNGKey(0))
        else:
            pointnet_params = load_torch_state_dict(args.pointnet_ckpt)

    # deterministic gumbel: fixed logistic noise shared across samples
    # (test_gan.py:96-100 semantics: hard threshold logits + noise > 0)
    u = np.clip(np.random.rand(1, 1, H, W).astype(np.float32), 1e-6, 1 - 1e-6)
    fixed_logistic = jnp.asarray(np.log(u) - np.log1p(-u))

    # fan generation + feature extraction out over every attached device (the
    # reference spawns one process per GPU, test_gan.py:187-199; here the batch
    # axis is sharded over the mesh and XLA SPMD does the rest)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dusty_gan_v2_tpu.parallel import DATA_AXIS, make_mesh

    mesh = make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    if args.batch_size % n_dev:
        args.batch_size = ((args.batch_size + n_dev - 1) // n_dev) * n_dev
        print(f"batch_size rounded up to {args.batch_size} ({n_dev} devices)")
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    g_vars = jax.device_put(g_vars, repl)
    angle = jax.device_put(angle, repl)
    fixed_logistic = jax.device_put(fixed_logistic, repl)

    # hoisted PE pyramid (r5): constants of the fixed sensor grid — computed once
    # per run instead of inside all ~n/batch generate dispatches
    from dusty_gan_v2_tpu.models import build_pe_cache

    pe_cache = build_pe_cache(G, g_vars, angle, sharding=repl)

    @jax.jit
    def generate(z):
        kw = {} if pe_cache is None else {"pe_cache": pe_cache}
        o = G.apply(g_vars, z, angle, gumbel_noise=fixed_logistic, **kw)
        return o["image"]

    @jax.jit
    def to_outputs(img_tanh):
        inv = jnp.clip(tanh_to_sigmoid(img_tanh), 0, 1)
        pts = coord.convert(inv, "inv_depth_norm", "point_set") / coord.max_depth
        feats = (
            pointnet_features(pointnet_params, pts.transpose(0, 2, 1))
            if pointnet_params is not None
            else jnp.zeros((img_tanh.shape[0], 0))
        )
        small = downsample_point_clouds(pts, num_points)
        return inv, small, feats

    def collect_gen(n, keep_imgs_pts):
        """Generate n samples; download features for ALL (FPD/KPD need the full
        set) but images/point-clouds only for the first `keep_imgs_pts` — that is
        all SWD/JSD/1-NNA ever read (num_subsample), and the full-set downloads
        dominated the stage on tunnel-attached TPUs (~20 MB/batch, 930 s at 50k)."""
        imgs, pts, feats = [], [], []
        rng = jax.random.PRNGKey(args.seed)
        done = 0
        while done < n:
            b = min(args.batch_size, n - done)
            b = ((b + n_dev - 1) // n_dev) * n_dev  # keep shardable (trim below)
            rng, k = jax.random.split(rng)
            z = jax.device_put(jax.random.normal(k, (b, z_dim)), batch_sharding)
            img = generate(z)
            i, p, f = to_outputs(img)
            if done < keep_imgs_pts:
                imgs.append(i)
                pts.append(p)
            feats.append(f)
            done += b
        # results stay on device until ONE drain: a per-batch np.asarray blocks
        # the dispatch pipeline on every transfer round-trip
        imgs, pts, feats = jax.device_get((imgs, pts, feats))
        # the divisibility round-up can overshoot; trim to exactly n
        cat = lambda xs: np.concatenate(xs)[:n] if xs else np.zeros((0,))
        return cat(imgs), cat(pts), cat(feats)

    def collect_real(split):
        root = args.dataset_root or cfg.dataset.root
        ds = KITTIRaw(root=root, split=split, shape=(H, W),
                      min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
                      prune_missing=args.prune_missing
                      or bool(cfg.dataset.get("prune_missing", False)))
        imgs, pts, feats = [], [], []

        @jax.jit
        def reals_to_outputs(depth, mask):
            x = coord.convert(depth, "depth", "inv_depth_norm")
            x = sigmoid_to_tanh(x)
            x = mask * x + (1 - mask) * float(
                cfg.model.generator.measurement_kwargs.raydrop_const
            )
            return to_outputs(x)

        for batch in Prefetcher(ds, args.batch_size, num_workers=4):
            i, p, f = reals_to_outputs(
                jnp.asarray(batch["depth"]), jnp.asarray(batch["mask"])
            )
            imgs.append(i)
            pts.append(p)
            feats.append(f)
        imgs, pts, feats = jax.device_get((imgs, pts, feats))
        return (np.concatenate(imgs), np.concatenate(pts), np.concatenate(feats))

    import time as _time

    stage_t = _time.time()

    def stage(name):
        nonlocal stage_t
        now = _time.time()
        print(f"[t] {name}: {now - stage_t:.1f}s")
        stage_t = now

    print("generating", args.num_samples, "samples...")
    need_imgs_pts = any(m in metrics for m in ("swd", "jsd")) or any(
        m.startswith("1nna") for m in metrics
    )
    gen_imgs, gen_pts, gen_feats = collect_gen(
        args.num_samples, args.num_subsample if need_imgs_pts else 0
    )
    stage(f"generate+features+fps x{args.num_samples}")

    need_test = any(m in metrics for m in ("swd", "jsd")) or any(
        m.startswith("1nna") for m in metrics
    )
    need_train = need_feats
    test_data = collect_real("test") if need_test else None
    train_data = collect_real("train") if need_train else None
    if need_test or need_train:
        stage("real data collection")

    N_sub = args.num_subsample
    scores = {}
    if "swd" in metrics:
        scores.update(compute_swd(gen_imgs[:N_sub], test_data[0][:N_sub]))
        stage("swd")
    if "jsd" in metrics:
        scores["jsd"] = compute_jsd(gen_pts[:N_sub] / 2.0, test_data[1][:N_sub] / 2.0)
        stage("jsd")
    for m in metrics:
        if m.startswith("1nna"):
            dist = m.split("-")[1]
            scores.update(
                compute_cov_mmd_1nna(
                    gen_pts[:N_sub], test_data[1][:N_sub],
                    batch_size=args.pairwise_batch, metrics=(dist,),
                )
            )
            stage(m)
    if "fpd" in metrics:
        scores["fpd"] = compute_frechet_distance(gen_feats, train_data[2])
        stage("fpd")
    if "kpd" in metrics:
        scores["kpd"] = compute_squared_mmd(gen_feats, train_data[2]) * 1000.0
        stage("kpd")

    for k, v in sorted(scores.items()):
        print(f"{k:>30}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
