"""Ground the semseg vertical's perf story: SqueezeSegV2 training-step wall-clock,
XLA FLOPs, MFU on the attached accelerator.

Mirrors scripts/bench_train.py for the GAN vertical. The step is the exact
train_semseg.py step_fn (focal loss + CRF-as-RNN head + SGD/clip/decay schedule,
reference counterpart /root/reference/train_semseg.py:243-281) on synthetic batches
at the shipped 64x512 / batch-40 sim2real config.

    python scripts/bench_semseg.py [--batch 40] [--config ...] [--iters 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def run_semseg_bench(config="configs/semseg/sim2real_w_gan_noise_dustyv2.yaml",
                     batch=40, iters=20, no_crf=False, dtype=None, no_donate=False):
    """Time the exact train_semseg.py step on the attached device; returns the
    record dict. Importable (bench.py embeds it in the driver record)."""
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from jax.sharding import PartitionSpec as P

    from bench import _device_peak
    from dusty_gan_v2_tpu.parallel import DATA_AXIS, make_mesh
    from dusty_gan_v2_tpu.training.trainer import _shard_map
    from dusty_gan_v2_tpu.semseg import cross_entropy, focal_loss, masked_seg_loss
    from dusty_gan_v2_tpu.utils.config import load_config
    from train_semseg import MODALITY_CH, build_model

    class args:  # keep the original body unchanged below
        pass

    args.config, args.batch, args.iters = config, batch, iters
    args.no_crf, args.dtype, args.no_donate = no_crf, dtype, no_donate

    cfg = load_config(args.config)
    if args.no_crf:
        cfg.arch.use_crf = False
    if args.dtype:
        cfg.arch.compute_dtype = args.dtype
    model = build_model(cfg)
    modalities = tuple(cfg.arch.inputs)
    in_ch = sum(MODALITY_CH[m] for m in modalities)
    H, W = cfg.dataset.shape
    B = args.batch
    num_classes = int(cfg.dataset.num_classes)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        jnp.zeros((2, in_ch, H, W)), jnp.zeros((2, 3, H, W)), jnp.ones((2, H, W)),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sched = optax.exponential_decay(
        float(cfg.training.lr),
        transition_steps=int(cfg.training.lr_decay_steps),
        decay_rate=float(cfg.training.lr_decay), staircase=True,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(float(cfg.training.max_grad_norm)),
        optax.add_decayed_weights(float(cfg.training.weight_decay)),
        optax.sgd(sched, momentum=float(cfg.training.lr_momentum)),
    )
    opt_state = tx.init(params)

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

    # the exact production step wrapping from train_semseg.py (shard_map over the
    # mesh + donation + on-device confusion); on 1 device the pmeans are identity
    from train_semseg import confusion_device

    def step_fn(params, batch_stats, opt_state, batch, rng, it):
        rng = jax.random.fold_in(rng, it)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        xyz = batch["xyz"].astype(jnp.float32)
        mask = batch["mask"].astype(jnp.float32)
        label = batch["label"].astype(jnp.int32)
        inputs = jnp.concatenate(
            [batch[m].astype(jnp.float32) for m in modalities], axis=1
        )

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                inputs, xyz, mask,
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss = loss_of(out, label, mask)
            return loss, (mut.get("batch_stats", {}), out)

        (loss, (new_stats, logit)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pred = jnp.argmax(logit, axis=1)
        lm = (label * mask).astype(jnp.int32)
        pm = (pred.astype(jnp.float32) * mask).astype(jnp.int32)
        num_classes_ = logit.shape[1]
        conf = jax.lax.psum(confusion_device(lm, pm, num_classes_), DATA_AXIS)
        return params, new_stats, new_opt, jax.lax.pmean(loss, DATA_AXIS), conf

    mesh = make_mesh(jax.devices()[:1])
    # commit state to the mesh (replicated), as train_semseg.py does: the step's
    # outputs carry NamedSharding from out_specs and sharding is part of the jit
    # cache key — uncommitted init state makes step 2 a silent full recompile
    params, batch_stats, opt_state = jax.device_put(
        (params, batch_stats, opt_state), jax.sharding.NamedSharding(mesh, P())
    )
    step = jax.jit(
        _shard_map(
            step_fn, mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        ),
        donate_argnums=() if args.no_donate else (0, 1, 2),
    )

    rng = np.random.RandomState(0)
    depth = rng.uniform(2.0, 79.0, (B, 1, H, W)).astype(np.float32)
    xyz = rng.randn(B, 3, H, W).astype(np.float32)
    mask = (rng.rand(B, H, W) > 0.1).astype(np.float32)
    batch = {
        "xyz": jnp.asarray(xyz),
        "depth": jnp.asarray(depth),
        "label": jnp.asarray(
            rng.randint(0, num_classes, (B, H, W)).astype(np.uint8)
        ),
        "mask": jnp.asarray(mask.astype(np.uint8)),
    }
    batch = {k: v for k, v in batch.items()
             if k in modalities or k in ("xyz", "label", "mask")}

    params, batch_stats, opt_state, loss, _conf = step(
        params, batch_stats, opt_state, batch, jax.random.PRNGKey(1), np.uint32(0)
    )
    jax.device_get(loss)  # data-fetch fence: block_until_ready can return unfenced on this tunnel (r5)

    t0 = time.perf_counter()
    enq = []
    for i in range(args.iters):
        te = time.perf_counter()
        params, batch_stats, opt_state, loss, _conf = step(
            params, batch_stats, opt_state, batch, jax.random.PRNGKey(2), np.uint32(2 + i)
        )
        enq.append(round(1e3 * (time.perf_counter() - te), 1))
    jax.device_get(loss)  # data-fetch fence: block_until_ready can return unfenced on this tunnel (r5)
    dt = (time.perf_counter() - t0) / args.iters
    print("# enqueue_ms:", enq, "cache:", step._cache_size(), file=sys.stderr)

    flops = 0.0
    try:
        lowered = step.lower(
            params, batch_stats, opt_state, batch, jax.random.PRNGKey(0), np.uint32(0)
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    peak = _device_peak()
    rec = {
        "step": "semseg_train" + ("" if not args.no_crf else "_nocrf"),
        "arch": str(cfg.arch.name),
        "dtype": str(cfg.arch.get("compute_dtype", "float32")),
        "batch": B,
        "step_ms": round(1e3 * dt, 2),
        "imgs_per_sec": round(B / dt, 1),
        "flops_per_step": round(flops) if flops else None,
        "mfu_pct": round(100 * flops / dt / peak, 2) if flops and peak else None,
        "device": jax.devices()[0].device_kind,
    }
    return rec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default="configs/semseg/sim2real_w_gan_noise_dustyv2.yaml"
    )
    parser.add_argument("--batch", type=int, default=40)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--no_crf", action="store_true")
    parser.add_argument("--dtype", default=None, help="compute dtype, e.g. bfloat16")
    parser.add_argument("--no_donate", action="store_true")
    a = parser.parse_args()
    rec = run_semseg_bench(config=a.config, batch=a.batch, iters=a.iters,
                           no_crf=a.no_crf, dtype=a.dtype, no_donate=a.no_donate)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
