"""Train SqueezeSeg V1/V2 for sim2real LiDAR semantic segmentation, data-parallel.

Equivalent of reference train_semseg.py:65-399 in single-controller SPMD: the train step
(focal/CE masked loss, SGD+momentum+weight-decay, grad-norm clip, BatchNorm stat sync
via cross-device batch statistics) is one jitted shard_map program over a "data" mesh.
Dataset dispatch by config name mirrors reference :80-106 (clean / uniform / spatial /
GAN-noise dustyv1/v2 / real).

    python train_semseg.py --config configs/semseg/sim2real_w_gan_noise_dustyv2.yaml
"""

import argparse
import datetime
import json
import time
from collections import defaultdict, deque
from pathlib import Path

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dusty_gan_v2_tpu.datasets.kitti import InfiniteSampler, Prefetcher
from dusty_gan_v2_tpu.parallel import DATA_AXIS, make_mesh
from dusty_gan_v2_tpu.semseg import (
    GTALiDAR,
    GTALiDAR_GAN,
    KITTIRawFrontal,
    SqueezeSegV1,
    SqueezeSegV2,
    cross_entropy,
    focal_loss,
    masked_seg_loss,
)
from dusty_gan_v2_tpu.training.trainer import _shard_map
from dusty_gan_v2_tpu.utils.config import load_config, save_config

MODALITY_CH = {"xyz": 3, "depth": 1, "reflectance": 1, "mask": 1}


def make_inputs(item, modalities):
    parts = []
    for m in modalities:
        t = item[m]
        if t.ndim == 3:
            t = t[:, None]
        parts.append(t)
    xp = np if isinstance(parts[0], np.ndarray) else jnp
    return xp.concatenate(parts, axis=1)


def build_dataset(cfg):
    name = cfg.dataset.name
    flip = bool(cfg.dataset.random_flip)
    root = cfg.dataset.get("root", "data/kitti_raw_frontal")
    shape = tuple(cfg.dataset.shape)
    kw = dict(root=root, shape=shape, flip=flip, cache=cfg.dataset.get("cache"))
    if name == "kitti_raw_frontal":
        train = KITTIRawFrontal(split="train", **kw)
    elif name == "gta_lidar":
        drop = _resize_drop_map(np.load("data/avg_raydrop/kitti_raw_frontal.npy"), shape)
        train = GTALiDAR(raydrop_p=drop, **kw)
    elif name == "gta_lidar_w_uniform_noise":
        drop = np.load("data/avg_raydrop/kitti_raw_frontal.npy")
        drop = np.full(shape, drop.mean(), np.float32)
        train = GTALiDAR(raydrop_p=drop, **kw)
    elif name == "gta_lidar_w_gan_noise_dustyv1":
        train = GTALiDAR_GAN(gan_dir="GTAV_noise_v1", **kw)
    elif name == "gta_lidar_w_gan_noise_dustyv2":
        train = GTALiDAR_GAN(gan_dir="GTAV_noise_v2", **kw)
    elif name == "gta_lidar_wo_noise":
        train = GTALiDAR(raydrop_p=None, **kw)
    else:
        raise ValueError(name)
    val = KITTIRawFrontal(split="val", root=root, shape=shape)
    return train, val


def _resize_drop_map(drop, shape):
    from dusty_gan_v2_tpu.datasets.kitti import nearest_resize_hw

    if drop.shape == tuple(shape):
        return drop.astype(np.float32)
    return nearest_resize_hw(drop[..., None].astype(np.float32), shape)[..., 0]


def build_model(cfg):
    # trace-time implementation switches (value-exact reformulations, measured by
    # scripts/bench_semseg_parts.py — see BASELINE.md semseg section):
    #   arch.pool_impl:  "reduce_window" | "shift"
    #   arch.bn_one_pass: true | false
    from dusty_gan_v2_tpu.semseg.common import set_bn_one_pass, set_max_pool_impl

    if cfg.arch.get("pool_impl"):
        set_max_pool_impl(str(cfg.arch.pool_impl))
    if cfg.arch.get("bn_one_pass") is not None:
        set_bn_one_pass(bool(cfg.arch.bn_one_pass))
    kwargs = dict(
        inputs=tuple(cfg.arch.inputs),
        num_classes=int(cfg.dataset.num_classes),
        dtype=jnp.dtype(cfg.arch.get("compute_dtype", "float32")),
        head_dropout_p=float(cfg.arch.decoder.dropout_p),
        use_crf=bool(cfg.arch.use_crf),
        crf_kwargs={
            "kernel_size": tuple(cfg.arch.crf.kernel_size),
            "init_weight_smoothness": cfg.arch.crf.init_weight_smoothness,
            "init_weight_appearance": cfg.arch.crf.init_weight_appearance,
            "theta_gamma": tuple(np.atleast_1d(cfg.arch.crf.theta_gamma)),
            "theta_alpha": tuple(np.atleast_1d(cfg.arch.crf.theta_alpha)),
            "theta_beta": tuple(np.atleast_1d(cfg.arch.crf.theta_beta)),
            "num_iters": int(cfg.arch.crf.num_iters),
        } if cfg.arch.use_crf else None,
    )
    if cfg.arch.name == "squeezeseg_v1":
        return SqueezeSegV1(**kwargs)
    if cfg.arch.name == "squeezeseg_v2":
        return SqueezeSegV2(
            **kwargs,
            bn_momentum=float(cfg.arch.bn_momentum),
            logit_bias=tuple(cfg.dataset.logit_bias)
            if cfg.dataset.get("logit_bias") is not None
            else None,
        )
    raise ValueError(cfg.arch.name)


def evaluate_confusion(label, pred, num_classes):
    """per-class tp/fp/fn (reference test_semseg.py:23-42)."""
    tps = np.zeros(num_classes)
    fps = np.zeros(num_classes)
    fns = np.zeros(num_classes)
    for c in range(num_classes):
        tps[c] = ((pred == c) & (label == c)).sum()
        fps[c] = ((pred == c) & (label != c)).sum()
        fns[c] = ((pred != c) & (label == c)).sum()
    return tps, fps, fns


def confusion_device(label, pred, num_classes):
    """evaluate_confusion as on-device one-hot sums -> (3, C) [tp, fp, fn].

    Keeps the IoU bookkeeping off the host: downloading the (B,H,W) pred every
    step (~5 MB at the shipped config) and looping per class in numpy serialized
    the train loop on tunnel-attached TPUs. Matches evaluate_confusion on
    mask-zeroed labels/preds exactly (int counts in f32 are exact to 2^24)."""
    P = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    L = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
    axes = tuple(range(P.ndim - 1))
    tp = jnp.sum(P * L, axis=axes)
    fp = jnp.sum(P, axis=axes) - tp
    fn = jnp.sum(L, axis=axes) - tp
    return jnp.stack([tp, fp, fn])


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.dry_run:
        print(json.dumps(cfg.to_dict(), indent=2, default=str))
        return

    mesh = make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    batch_size = int(cfg.training.batch_size)
    assert batch_size % n_dev == 0

    model = build_model(cfg)
    num_classes = int(cfg.dataset.num_classes)
    modalities = tuple(cfg.arch.inputs)
    in_ch = sum(MODALITY_CH[m] for m in modalities)

    H, W = cfg.dataset.shape
    key = jax.random.PRNGKey(int(cfg.random_seed))
    x0 = jnp.zeros((2, in_ch, H, W))
    xyz0 = jnp.zeros((2, 3, H, W))
    mask0 = jnp.ones((2, H, W))
    variables = model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, x0, xyz0, mask0
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # ImageNet SqueezeNet-v1.1 encoder init (reference squeezeseg_v2.py:136-159,
    # pretrained_weights=True by default). Offline-friendly: a cached/local pickle
    # is used when present; otherwise we warn and train from scratch.
    if cfg.arch.name == "squeezeseg_v2" and bool(
        cfg.arch.get("pretrained_weights", True)
    ):
        from dusty_gan_v2_tpu.semseg import (
            apply_squeezenet_fire_weights,
            load_squeezenet_v11,
        )

        try:
            weights = load_squeezenet_v11(cfg.arch.get("pretrained_path"))
            params = apply_squeezenet_fire_weights(params, weights)
            print("loaded ImageNet SqueezeNet-v1.1 Fire weights into the encoder")
        except FileNotFoundError as e:
            print(f"WARNING: pretrained encoder init unavailable ({e}); "
                  "encoder starts from trunc-normal init")

    # SGD + momentum + weight decay; exponential decay every lr_decay_steps
    steps_total = args.max_steps or int(cfg.training.max_steps)
    decay_every = int(cfg.training.lr_decay_steps)
    sched = optax.exponential_decay(
        float(cfg.training.lr), transition_steps=decay_every,
        decay_rate=float(cfg.training.lr_decay), staircase=True,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(float(cfg.training.max_grad_norm)),
        optax.add_decayed_weights(float(cfg.training.weight_decay)),
        optax.sgd(sched, momentum=float(cfg.training.lr_momentum)),
    )
    opt_state = tx.init(params)

    # commit the train state to the mesh up front (replicated): the jitted step's
    # outputs carry NamedSharding from out_specs, and sharding is part of the jit
    # cache key — uncommitted init state would make step 2 a silent full recompile
    repl = jax.sharding.NamedSharding(mesh, P())
    params, batch_stats, opt_state = jax.device_put(
        (params, batch_stats, opt_state), repl
    )

    loss_name = cfg.loss.name
    cls_weight = jnp.asarray(cfg.loss.cls_weight, jnp.float32)
    gamma = float(cfg.loss.get("focal_gamma", 2.0))
    coef = float(cfg.loss.cls_loss_coef)

    def loss_of(logit, label, mask):
        if loss_name == "focal_loss":
            pl = focal_loss(logit, label, gamma, cls_weight)
        else:
            pl = cross_entropy(logit, label, cls_weight)
        return masked_seg_loss(pl, mask) * coef

    def step_fn(params, batch_stats, opt_state, batch, rng, it):
        # per-iteration fold happens in-jit (a host-side fold_in costs a remote
        # dispatch round-trip per step on tunnel-attached TPUs). No axis fold: the
        # dropout masks key off GLOBAL sample ids (semseg/common.py HeadConv) and
        # BatchNorm uses cross-shard moments, so the step is device-count invariant.
        rng = jax.random.fold_in(rng, it)
        # the host ships each modality ONCE (xyz was previously uploaded twice:
        # inside `inputs` and again for the CRF) in compact dtypes; the input
        # concat and dtype restoration happen here on device
        xyz = batch["xyz"].astype(jnp.float32)
        mask = batch["mask"].astype(jnp.float32)
        label = batch["label"].astype(jnp.int32)
        # 3-D modalities (mask ships as (B,H,W) uint8) are re-expanded here so the
        # host never uploads a second float copy of them
        inputs = jnp.concatenate(
            [
                (t if t.ndim == 4 else t[:, None]).astype(jnp.float32)
                for t in (batch[m] for m in modalities)
            ],
            axis=1,
        )

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                inputs, xyz, mask,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = loss_of(out, label, mask)
            return loss, (mut.get("batch_stats", {}), out)

        (loss, (new_stats, logit)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        # running stats are already identical across shards (BatchNorm2d normalizes
        # with cross-shard moments, SyncBatchNorm semantics); pmean kept as a cheap
        # safety net against drift
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # IoU bookkeeping on device: (3,C) counts instead of a (B,H,W) download
        pred = jnp.argmax(logit, axis=1)
        lm = (label * mask).astype(jnp.int32)
        pm = (pred.astype(jnp.float32) * mask).astype(jnp.int32)
        conf = jax.lax.psum(confusion_device(lm, pm, num_classes), DATA_AXIS)
        return params, new_stats, new_opt, jax.lax.pmean(loss, DATA_AXIS), conf

    sharded_step = jax.jit(
        _shard_map(
            step_fn, mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        ),
        donate_argnums=(0, 1, 2),
    )

    train_ds, val_ds = build_dataset(cfg)
    sampler = InfiniteSampler(len(train_ds), seed=int(cfg.random_seed))
    loader = iter(Prefetcher(train_ds, batch_size, sampler, num_workers=args.num_workers))

    if args.log_dir is None:
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        log_dir = Path("logs/semseg") / cfg.dataset.name / cfg.arch.name / stamp
    else:
        log_dir = Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, str(log_dir / "training_config.yaml"))
    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(log_dir=str(log_dir / "tensorboard"))

    conf = defaultdict(lambda: np.zeros(num_classes))
    moving = deque(maxlen=100)
    ckpt_cfg = cfg.training.checkpoint
    t0 = time.time()

    # host assembles numpy batches; DevicePrefetcher keeps 2 uploaded ahead so
    # host->device transfer overlaps the running step (as in train_gan)
    from dusty_gan_v2_tpu.datasets.kitti import DevicePrefetcher
    from dusty_gan_v2_tpu.parallel import global_batch

    # compact upload dtypes: label/mask as uint8 (exact), float modalities
    # optionally float16 (`dataset.upload_dtype`; the step restores f32)
    up_dtype = np.dtype(cfg.dataset.get("upload_dtype", "float32"))

    def _assembled():
        while True:
            raw = next(loader)
            out = {"xyz": raw["xyz"].astype(up_dtype, copy=False)}
            for m in modalities:
                # xyz/mask already ship below (mask exactly, as uint8); the
                # in-step concat re-expands 3-D modalities, so no float copy
                if m in ("xyz", "mask"):
                    continue
                t = raw[m]
                out[m] = (t if t.ndim == 4 else t[:, None]).astype(
                    up_dtype, copy=False
                )
            out["label"] = raw["label"].astype(np.uint8)
            out["mask"] = raw["mask"].astype(np.uint8)
            yield out

    dev_loader = DevicePrefetcher(_assembled(), lambda b: global_batch(mesh, b))

    pending = []  # (loss, conf) device pairs; drained as ONE transfer per interval
    for step in range(1, steps_total + 1):
        batch = next(dev_loader)
        params, batch_stats, opt_state, loss, confd = sharded_step(
            params, batch_stats, opt_state, batch, key, np.uint32(step)
        )
        pending.append((loss, confd))

        if step % int(ckpt_cfg.stats) == 0 or step == steps_total:
            for l, c in jax.device_get(pending):
                moving.append(float(l))
                conf["tp"] += c[0]
                conf["fp"] += c[1]
                conf["fn"] += c[2]
            pending.clear()
            eps = 1e-12
            iou = conf["tp"] / (conf["tp"] + conf["fn"] + conf["fp"] + eps)
            writer.add_scalar("train/loss", float(np.mean(moving)), step)
            writer.add_scalar("train/iou/mean", float(iou[1:].mean()), step)
            writer.add_scalar("train/lr", float(sched(step)), step)
            sps = step * batch_size / (time.time() - t0)
            print(f"step {step:>7}/{steps_total} loss {np.mean(moving):.4f} "
                  f"miou {iou[1:].mean():.3f} ({sps:.1f} imgs/s)")
            conf = defaultdict(lambda: np.zeros(num_classes))

        if step % int(ckpt_cfg.test) == 0 or step == steps_total:
            # validation
            vconf = defaultdict(lambda: np.zeros(num_classes))

            def _eval_conf(p, s, x, xyz, m, label):
                pred = jnp.argmax(
                    model.apply({"params": p, "batch_stats": s}, x, xyz, m), axis=1
                )
                lm = (label * m).astype(jnp.int32)
                pm = (pred.astype(jnp.float32) * m).astype(jnp.int32)
                return confusion_device(lm, pm, num_classes)

            eval_fn = jax.jit(_eval_conf)
            vpending = []
            for vraw in Prefetcher(val_ds, batch_size, num_workers=args.num_workers):
                vpending.append(eval_fn(
                    params, batch_stats, make_inputs(vraw, modalities),
                    jnp.asarray(vraw["xyz"]), jnp.asarray(vraw["mask"]),
                    jnp.asarray(vraw["label"].astype(np.int32)),
                ))
            for c in jax.device_get(vpending):
                vconf["tp"] += c[0]
                vconf["fp"] += c[1]
                vconf["fn"] += c[2]
            eps = 1e-12
            iou = vconf["tp"] / (vconf["tp"] + vconf["fn"] + vconf["fp"] + eps)
            writer.add_scalar("val/iou/mean", float(iou[1:].mean()), step)
            print(f"[val] step {step}: miou={iou[1:].mean():.4f} per-class={iou}")

            import flax.serialization

            payload = flax.serialization.msgpack_serialize(
                {
                    "cfg_yaml": json.dumps(cfg.to_dict()),
                    "step": np.int64(step),
                    "params": flax.serialization.to_state_dict(jax.device_get(params)),
                    "batch_stats": flax.serialization.to_state_dict(
                        jax.device_get(batch_stats)
                    ),
                }
            )
            path = log_dir / "models" / f"checkpoint_step-{step:010d}.ckpt"
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(path, "wb") as f:
                f.write(payload)


if __name__ == "__main__":
    main()
