"""Bisect the semseg training step (SqueezeSegV2 + CRF, train_semseg.py step
semantics) into its cost components on the attached accelerator, and A/B the
exact implementation reformulations in semseg/common.py.

The step is ~2.2% MFU with ~4 ms of ideal MXU time (BASELINE.md), i.e. almost
all wall-clock is bandwidth/elementwise/scheduling — this script measures WHERE
by timing, in ONE process (the only reliable pattern on the tunneled setup):

  production        the exact shipped step
  fwd_only          loss forward only (no grad) — bounds the backward
  pool_shift        max pools via shift-doubling pairwise maxes (exact; VJP
                    becomes selects instead of select_and_scatter)
  bn_one_pass       BN moments in one activation pass (exact; common.py)
  pool_shift+bn1p   both reformulations together
  cam_nopool        ABLATION: CAM 7x7 stride-1 context pool skipped
  ds_nopool         ABLATION: encoder downsample pools -> strided slice
  bn_frozen         ABLATION: BN uses running stats (no moment computation)
  sum_loss          ABLATION: focal+mask loss -> logit.sum()
  no_conf           ABLATION: on-device confusion matrix skipped

Ablations are NOT exact (they change semantics) — they bound a component's
cost. Reformulations are exact (tests/test_semseg.py::TestImplReformulations)
and can be promoted to production defaults if they win here.

    python scripts/bench_semseg_parts.py [--batch 40] [--dtype bfloat16]
        [--iters 15] [--variants production,pool_shift,...]
"""

import argparse
import contextlib
import json
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
    import optax

    from jax.sharding import PartitionSpec as P

    from dusty_gan_v2_tpu.parallel import DATA_AXIS, make_mesh
    from dusty_gan_v2_tpu.semseg import common as C
    from dusty_gan_v2_tpu.semseg import squeezeseg as S
    from dusty_gan_v2_tpu.semseg import cross_entropy, focal_loss, masked_seg_loss
    from dusty_gan_v2_tpu.training.trainer import _shard_map
    from dusty_gan_v2_tpu.utils.config import load_config
    from train_semseg import MODALITY_CH, build_model, confusion_device

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default="configs/semseg/sim2real_w_gan_noise_dustyv2.yaml"
    )
    parser.add_argument("--batch", type=int, default=40)
    parser.add_argument("--iters", type=int, default=15)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--variants", default=None, help="comma list; default all")
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.dtype:
        cfg.arch.compute_dtype = args.dtype
    modalities = tuple(cfg.arch.inputs)
    in_ch = sum(MODALITY_CH[m] for m in modalities)
    H, W = cfg.dataset.shape
    B = args.batch
    num_classes = int(cfg.dataset.num_classes)

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

    loss_name = cfg.loss.name
    cls_weight = jnp.asarray(cfg.loss.cls_weight, jnp.float32)
    gamma = float(cfg.loss.get("focal_gamma", 2.0))
    coef = float(cfg.loss.cls_loss_coef)

    mesh = make_mesh(jax.devices()[:1])
    repl = jax.sharding.NamedSharding(mesh, P())

    rng_np = np.random.RandomState(0)
    batch = {
        "xyz": jnp.asarray(rng_np.randn(B, 3, H, W).astype(np.float32)),
        "depth": jnp.asarray(
            rng_np.uniform(2.0, 79.0, (B, 1, H, W)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng_np.randint(0, num_classes, (B, H, W)).astype(np.uint8)
        ),
        "mask": jnp.asarray((rng_np.rand(B, H, W) > 0.1).astype(np.uint8)),
    }
    batch = {k: v for k, v in batch.items()
             if k in modalities or k in ("xyz", "label", "mask")}

    # --- ablation monkeypatches -------------------------------------------------
    orig_pool = C.max_pool2d
    orig_bn_call = C.BatchNorm2d.__call__

    @contextlib.contextmanager
    def patched(**kw):
        def pool(x, kernel=3, stride=(1, 2), padding=1, impl=None):
            if isinstance(stride, int):
                stride = (stride, stride)
            if kw.get("cam_nopool") and stride == (1, 1):
                return x
            if kw.get("ds_nopool") and stride != (1, 1):
                return x[:, :, :: stride[0], :: stride[1]]
            return orig_pool(x, kernel, stride, padding, impl)

        if kw.get("cam_nopool") or kw.get("ds_nopool"):
            C.max_pool2d = pool
            S.max_pool2d = pool
        if kw.get("bn_frozen"):
            C.BatchNorm2d.__call__ = (
                lambda self, x, train=False: orig_bn_call(self, x, False)
            )
        # "production" ({}) times the shipped module defaults; explicit keys
        # override (the literal-reference forms are reduce_window + two-pass BN)
        prev = (C._BN_ONE_PASS, C._POOL_IMPL)
        C.set_bn_one_pass(bool(kw.get("bn_one_pass", prev[0])))
        C.set_max_pool_impl(kw.get("pool_impl", prev[1]))
        try:
            yield
        finally:
            C.max_pool2d = orig_pool
            S.max_pool2d = orig_pool
            C.BatchNorm2d.__call__ = orig_bn_call
            C.set_bn_one_pass(prev[0])
            C.set_max_pool_impl(prev[1])

    def build_and_time(name, fwd_only=False, sum_loss=False, no_conf=False, **kw):
        with patched(**kw):
            model = build_model(cfg)
            key = jax.random.PRNGKey(0)
            variables = model.init(
                {"params": key, "dropout": jax.random.fold_in(key, 1)},
                jnp.zeros((2, in_ch, H, W)), jnp.zeros((2, 3, H, W)),
                jnp.ones((2, H, W)),
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            opt_state = tx.init(params)

            def loss_of(logit, label, mask):
                if sum_loss:
                    return logit.sum() * 0.0 + logit.mean()
                if loss_name == "focal_loss":
                    pl = focal_loss(logit, label, gamma, cls_weight)
                else:
                    pl = cross_entropy(logit, label, cls_weight)
                return masked_seg_loss(pl, mask) * coef

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
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": rng},
                    )
                    loss = loss_of(out, label, mask)
                    return loss, (mut.get("batch_stats", {}), out)

                if fwd_only:
                    loss, (new_stats, logit) = loss_fn(params)
                    grads = params  # placeholder, unused
                    new_opt = opt_state
                else:
                    (loss, (new_stats, logit)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params)
                    grads = jax.lax.pmean(grads, DATA_AXIS)
                    updates, new_opt = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
                if no_conf or fwd_only:
                    conf = jnp.zeros((3, logit.shape[1]), jnp.float32)
                else:
                    pred = jnp.argmax(logit, axis=1)
                    lm = (label * mask).astype(jnp.int32)
                    pm = (pred.astype(jnp.float32) * mask).astype(jnp.int32)
                    conf = jax.lax.psum(
                        confusion_device(lm, pm, logit.shape[1]), DATA_AXIS
                    )
                return params, new_stats, new_opt, jax.lax.pmean(loss, DATA_AXIS), conf

            params, batch_stats, opt_state = jax.device_put(
                (params, batch_stats, opt_state), repl
            )
            step = jax.jit(
                _shard_map(
                    step_fn, mesh,
                    in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P()),
                    out_specs=(P(), P(), P(), P(), P()),
                ),
                donate_argnums=(0, 1, 2),
            )

            for i in range(3):  # warmup (compile + steady state)
                params, batch_stats, opt_state, loss, _conf = step(
                    params, batch_stats, opt_state, batch,
                    jax.random.PRNGKey(1), np.uint32(i),
                )
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for i in range(args.iters):
                params, batch_stats, opt_state, loss, _conf = step(
                    params, batch_stats, opt_state, batch,
                    jax.random.PRNGKey(2), np.uint32(10 + i),
                )
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "variant": name,
                "dtype": str(cfg.arch.get("compute_dtype", "float32")),
                "batch": B,
                "step_ms": round(1e3 * dt, 2),
                "imgs_per_sec": round(B / dt, 1),
            }), flush=True)
            return dt

    all_variants = {
        "production": {},
        "literal_reference": {"pool_impl": "reduce_window", "bn_one_pass": False},
        "fwd_only": {"fwd_only": True},
        "pool_shift": {"pool_impl": "shift"},
        "pool_sep": {"pool_impl": "separable"},
        "pool_sep+bn1p": {"pool_impl": "separable", "bn_one_pass": True},
        "bn_one_pass": {"bn_one_pass": True},
        "pool_shift+bn1p": {"pool_impl": "shift", "bn_one_pass": True},
        "cam_nopool": {"cam_nopool": True},
        "ds_nopool": {"ds_nopool": True},
        "all_nopool": {"cam_nopool": True, "ds_nopool": True},
        "bn_frozen": {"bn_frozen": True},
        "sum_loss": {"sum_loss": True},
        "no_conf": {"no_conf": True},
    }
    names = (args.variants.split(",") if args.variants else list(all_variants))
    for name in names:
        build_and_time(name, **all_variants[name])


if __name__ == "__main__":
    main()
