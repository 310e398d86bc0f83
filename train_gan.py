"""Train a LiDAR range-image GAN (DUSty v2 / v1 / vanilla) data-parallel on a TPU mesh.

Equivalent of reference train_gan.py:71-211, single-controller SPMD instead of
torch.multiprocessing: one process drives the whole mesh; the train step is a jitted
shard_map program (see dusty_gan_v2_tpu/training/trainer.py).

    python train_gan.py --config configs/gans/dusty_v2.yaml [--resume ckpt] [--dry_run]
"""

import argparse
import datetime
import json
import os
import time
from collections import defaultdict, deque
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.datasets.kitti import (
    DevicePrefetcher,
    InfiniteSampler,
    KITTIRaw,
    Prefetcher,
)
from dusty_gan_v2_tpu.geometry import make_Rt
from dusty_gan_v2_tpu.metrics import (
    compute_frechet_distance,
    compute_squared_mmd,
    init_pointnet_params,
    load_torch_state_dict,
    pointnet_features,
)
from dusty_gan_v2_tpu.training import Trainer
from dusty_gan_v2_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from dusty_gan_v2_tpu.utils import (
    colorize,
    init_random_seed,
    points_to_normal_2d,
    power_spectrum_2d,
    tanh_to_sigmoid,
)
from dusty_gan_v2_tpu.utils.config import load_config, save_config


def log_images(writer, tag, step, coord=None, image=None, image_orig=None,
               image_aug=None, raydrop_logit=None, raydrop_mask=None):
    """TensorBoard image panels (range image, spectrum, normals, BEV)
    — mirrors reference train_gan.py:29-68."""
    if image_orig is not None:
        writer.add_images(
            tag + "/image/orig",
            np.asarray(colorize(jnp.clip(tanh_to_sigmoid(image_orig), 0, 1))), step,
        )
    if image_aug is not None:
        writer.add_images(
            tag + "/image/aug",
            np.asarray(colorize(jnp.clip(tanh_to_sigmoid(image_aug), 0, 1))), step,
        )
    if raydrop_logit is not None:
        writer.add_images(
            tag + "/raydrop_prob",
            np.asarray(colorize(jax.nn.sigmoid(raydrop_logit))), step,
        )
    if raydrop_mask is not None:
        writer.add_images(tag + "/raydrop_mask", np.asarray(raydrop_mask), step)
    if image is not None and coord is not None:
        inv_depth = jnp.clip(tanh_to_sigmoid(image), 0, 1)
        pm = coord.convert(inv_depth, "inv_depth_norm", "point_map") / coord.max_depth
        nm = points_to_normal_2d(pm, mode="closest")
        B = pm.shape[0]
        from dusty_gan_v2_tpu.geometry import render_point_clouds

        bev = render_point_clouds(
            pm.reshape(B, 3, -1).transpose(0, 2, 1),
            nm.reshape(B, 3, -1).transpose(0, 2, 1),
            size=image.shape[-1],
            t=jnp.asarray([[0.0, 0.0, 0.7]]),
        )
        spec = power_spectrum_2d(inv_depth)
        spec = spec - spec.min()
        spec = spec / spec.max()
        writer.add_images(tag + "/image", np.asarray(colorize(inv_depth)), step)
        writer.add_images(tag + "/image/spectrum", np.asarray(colorize(spec)), step)
        writer.add_images(tag + "/normal", np.asarray(nm), step)
        writer.add_images(tag + "/pointcloud", np.asarray(jnp.clip(bev, 0, 1)), step)


def validation_fpd_kpd(trainer, state, train_loader_factory, pointnet_params,
                       real_feats_cache, num_samples=10_000):
    """FPD/KPD over PointNet features of generated vs real clouds
    (reference trainer.py:494-549)."""
    from dusty_gan_v2_tpu.geometry import CoordBridge

    cfg = trainer.cfg
    coord = CoordBridge(
        num_ring=trainer.resolution[0], num_points=trainer.resolution[1],
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        angle=np.asarray(trainer.angle),
    )

    @jax.jit
    def feats_of_images(img):  # tanh-scaled inv-depth-norm
        inv = jnp.clip(tanh_to_sigmoid(img), 0, 1)
        pts = coord.convert(inv, "inv_depth_norm", "point_set") / coord.max_depth
        return pointnet_features(pointnet_params, pts.transpose(0, 2, 1))

    if real_feats_cache.get("feats") is None:
        feats = []
        for batch in train_loader_factory():
            from dusty_gan_v2_tpu.training.trainer import fetch_reals

            reals = fetch_reals(
                {k: jnp.asarray(v) for k, v in batch.items()},
                cfg.dataset.min_depth, cfg.dataset.max_depth,
                float(cfg.dataset.raydrop_const),
            )
            feats.append(np.asarray(feats_of_images(reals["image"])))
        real_feats_cache["feats"] = np.concatenate(feats, axis=0)

    B = int(cfg.validation.batch_size)
    fake_feats = []
    rng = jax.random.PRNGKey(12345)
    n_done = 0
    while n_done < num_samples:
        b = min(B, num_samples - n_done)
        rng, k1, k2 = jax.random.split(rng, 3)
        z = jax.random.normal(k1, (b, trainer.z_dim))
        o = trainer.sample(state, z, k2, ema=True)
        fake_feats.append(np.asarray(feats_of_images(o["image"])))
        n_done += b
    fake_feats = np.concatenate(fake_feats, axis=0)
    real = real_feats_cache["feats"]
    return {
        f"pointcloud/frechet_distance_{num_samples // 1000}k": compute_frechet_distance(
            fake_feats, real
        ),
        f"pointcloud/squared_mmd_{num_samples // 1000}k": compute_squared_mmd(
            fake_feats, real
        ),
    }


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--pointnet_ckpt", default=None,
                        help="path to cls_model_39.pth for FPD validation")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture an xprof trace of steps 20-25 into DIR")
    parser.add_argument("--ckpt_backend", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="orbax = multi-host sharded async checkpoint dirs")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize before training "
                             "(params auto-detected; see --coordinator etc.)")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.dry_run:
        print(json.dumps(cfg.to_dict(), indent=2, default=str))
        return

    if args.distributed:
        from dusty_gan_v2_tpu.parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    rank = jax.process_index()
    world = jax.process_count()
    is_chief = rank == 0

    # NOTE: the same seed on every host — params/z draws must be identical across
    # processes (replicated state); per-device divergence happens inside the step
    # via fold_in(axis_index). Only the data sampler is rank-sharded.
    key = init_random_seed(int(cfg.training.random_seed))

    trainer = Trainer(cfg)
    print(f"devices: {jax.device_count()} ({world} hosts) | "
          f"global batch {trainer.batch_size} ({trainer.B_local}/device)")

    # log dir
    if args.log_dir is None:
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        arch = f"{cfg.model.generator.arch}+{cfg.model.discriminator.arch}"
        log_dir = Path("logs/gans") / cfg.dataset.name / arch / stamp
    else:
        log_dir = Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, str(log_dir / "config.yaml"))
    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(log_dir=str(log_dir / "tensorboard"))

    # data
    dataset = KITTIRaw(
        root=cfg.dataset.root, split="train", shape=trainer.resolution,
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        flip=bool(cfg.dataset.get("flip", False)),
        prune_missing=bool(cfg.dataset.get("prune_missing", False)),
        cache=cfg.dataset.get("cache"),  # "ram": memoize projected frames
    )
    # rank-sharded infinite sampler (reference gans/utils.py:238-271 + trainer.py:104):
    # every host draws an interleaved slice of the same shuffled stream and loads
    # only its share of the global batch.
    assert trainer.batch_size % world == 0, (trainer.batch_size, world)
    sampler = InfiniteSampler(
        len(dataset), rank=rank, num_replicas=world, seed=int(cfg.random_seed)
    )
    loader = iter(
        Prefetcher(dataset, trainer.batch_size // world, sampler,
                   num_workers=args.num_workers)
    )

    state = trainer.init_state(key)
    start_iter = 0
    if args.resume:
        _, state, _, num_imgs = load_checkpoint(args.resume, state)
        start_iter = num_imgs // trainer.batch_size
        print(f"resumed from {args.resume} at iteration {start_iter:,}")

    # validation assets
    pointnet_params = None
    if args.pointnet_ckpt and os.path.exists(args.pointnet_ckpt):
        pointnet_params = load_torch_state_dict(args.pointnet_ckpt)
    real_feats_cache = {}

    total_iters = int(cfg.training.total_kimg * 1e3 / trainer.batch_size)
    ckpt_cfg = cfg.training.checkpoint
    moving = defaultdict(lambda: deque(maxlen=100))
    from dusty_gan_v2_tpu.geometry import CoordBridge

    coord = CoordBridge(
        num_ring=trainer.resolution[0], num_points=trainer.resolution[1],
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        angle=np.asarray(trainer.angle),
    )
    z_fixed = jax.random.normal(jax.random.fold_in(key, 99), (8, trainer.z_dim))

    # real panel once at start (reference train_gan.py:98-107); panels are computed
    # from the chief's host-local rows — no cross-host transfers needed
    from dusty_gan_v2_tpu.parallel import global_batch
    from dusty_gan_v2_tpu.training.trainer import fetch_reals

    raw = {k: v for k, v in next(loader).items() if k in ("depth", "mask")}
    if is_chief:
        local8 = {k: jnp.asarray(v[:8]) for k, v in raw.items()}
        reals0 = fetch_reals(local8, cfg.dataset.min_depth, cfg.dataset.max_depth,
                             float(cfg.dataset.raydrop_const))
        log_images(writer, "real", 1, coord=coord, image=reals0["image"],
                   raydrop_mask=reals0["raydrop_mask"])

    # keep 2 batches uploaded ahead of the device: the async device_put overlaps
    # host->device transfer with the running step (important on tunneled TPUs).
    # Only the depth plane ships — the mask is recomputed on device as depth > 0
    # (exact: KITTIRaw zeroes all channels outside the mask), halving the bytes;
    # dataset.upload_dtype: float16 halves them again (inv-depth error <= 5e-4).
    up_dtype = np.dtype(cfg.dataset.get("upload_dtype", "float32"))

    def _upload(host_batch):
        dev = {"depth": host_batch["depth"].astype(up_dtype, copy=False)}
        raw = {k: v for k, v in host_batch.items() if k in ("depth", "mask")}
        return raw, global_batch(trainer.mesh, dev)

    dev_loader = DevicePrefetcher(loader, _upload, depth=2)

    t_start = time.time()
    pending_metrics = []
    for i in range(start_iter + 1, total_iters + 1):
        if args.profile and i - start_iter == 20:
            jax.profiler.start_trace(args.profile)
        raw, batch = next(dev_loader)
        state, metrics = trainer.step(state, batch, key, i)  # fold_in(key, i) in-jit
        if args.profile and i - start_iter == 25:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print(f"xprof trace written to {args.profile}")
        num_imgs = i * trainer.batch_size

        # metrics stay on device until the stats cadence, then drain as ONE
        # transfer: per-iteration float()/device_get each cost a blocking tunnel
        # round-trip AND serialize the dispatch pipeline (measured 50 -> 195+
        # imgs/s across these loop fixes on the tunnel-attached chip). The
        # DevicePrefetcher bounds how far dispatch runs ahead.
        pending_metrics.append(metrics)
        stats_tick = i % int(ckpt_cfg.save_stats) == 0 or i == total_iters
        if stats_tick:
            for m in jax.device_get(pending_metrics):
                for k, v in m.items():
                    moving[k].append(float(v))
            pending_metrics.clear()

        if is_chief and stats_tick:
            for k, dq in moving.items():
                writer.add_scalar(k, float(np.mean(dq)), num_imgs)
            ips = trainer.batch_size * i / (time.time() - t_start)
            writer.add_scalar("stats/imgs_per_sec", ips, num_imgs)
            print(f"iter {i:>8}/{total_iters} imgs {num_imgs:>10,} "
                  f"{ips:8.1f} imgs/s " +
                  " ".join(f"{k.split('/')[-1]}={np.mean(v):.3f}"
                           for k, v in list(moving.items())[:4]))

        if is_chief and i % int(ckpt_cfg.save_image) == 0:
            # augmented reals at the current ADA p (reference train_gan.py:122-131).
            # Multi-host: side-band panels run as *local* compute on the chief —
            # device_get the replicated state so no global program is launched.
            sbs = state if world == 1 else jax.device_get(state)
            local8 = {k: jnp.asarray(v[:8]) for k, v in raw.items()}
            reals_aug = trainer.augment_reals(
                sbs, local8, jax.random.fold_in(key, 2 * i + 1), i
            )
            log_images(writer, "real", num_imgs, image_aug=reals_aug)
            fakes = trainer.sample(sbs, z_fixed, jax.random.fold_in(key, 2 * i), ema=True)
            log_images(
                writer, "fake", num_imgs, coord=coord,
                image=fakes.get("image"), image_orig=fakes.get("image_orig"),
                raydrop_logit=fakes.get("raydrop_logit"),
                raydrop_mask=fakes.get("raydrop_mask"),
            )

        if (is_chief and pointnet_params is not None
                and i % int(ckpt_cfg.validation) == 0):
            def loader_factory():
                return iter(Prefetcher(dataset, int(cfg.validation.batch_size),
                                       num_workers=args.num_workers))

            sbs = state if world == 1 else jax.device_get(state)
            scores = validation_fpd_kpd(
                trainer, sbs, loader_factory, pointnet_params, real_feats_cache
            )
            for k, v in scores.items():
                writer.add_scalar("score/" + k, v, num_imgs)

        if i % int(ckpt_cfg.save_model) == 0 or i == total_iters:
            path = log_dir / "models" / f"checkpoint_{num_imgs:010d}.ckpt"
            if args.ckpt_backend == "orbax":
                # all processes participate (each writes its own shards)
                from dusty_gan_v2_tpu.training.checkpoint import save_checkpoint_orbax

                save_checkpoint_orbax(str(path), cfg, state, trainer.angle, num_imgs)
            elif is_chief:
                save_checkpoint(str(path), cfg, state, trainer.angle, num_imgs)

    if args.ckpt_backend == "orbax":
        from dusty_gan_v2_tpu.training.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()


if __name__ == "__main__":
    main()
