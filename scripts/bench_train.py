"""Ground the training-step perf story: wall-clock, XLA FLOPs, MFU, optional xprof.

Runs the full dusty_v2 64x512 training step (shipped config schedule) on the attached
accelerator and prints a JSON record per variant:

    python scripts/bench_train.py [--profile DIR] [--batch 32] [--dtype float32|bfloat16]

Used to produce the measured table in BASELINE.md (reference counterpart: the repo
publishes no numbers; see /root/reference/gans/trainer.py:247-482 for the step shape).
"""

import argparse
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

    from bench import PEAK_FLOPS_BF16, _device_peak
    from dusty_gan_v2_tpu.parallel import make_mesh
    from dusty_gan_v2_tpu.training import Trainer
    from dusty_gan_v2_tpu.utils.config import load_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/gans/dusty_v2.yaml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--profile", default=None,
                        help="capture an xprof trace of a few steps into this dir")
    parser.add_argument("--only", default=None,
                        help="time a single named variant (A/B runs)")
    parser.add_argument("--ab_blurconv", action="store_true",
                        help="time --only with D blur-conv fusion on/off/on/off "
                             "IN ONE PROCESS (same device session, no cross-run "
                             "variance)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize G blocks / D resblocks (HBM relief)")
    parser.add_argument("--ab_pecache", action="store_true",
                        help="time --only with the hoisted PE pyramid on/off/on/off "
                             "IN ONE PROCESS (r5; Trainer.use_pe_cache)")
    parser.add_argument("--ab_shift", action="store_true",
                        help="time --only with the fractional-W-shift formulation "
                             "matmul/gather/matmul/gather IN ONE PROCESS "
                             "(azimuth-cancel roll + ADA wrap; ops/shift.py)")
    args = parser.parse_args()

    cfg = load_config(args.config)
    cfg.training.batch_size = args.batch
    cfg.model.generator.compute_dtype = args.dtype
    cfg.model.discriminator.layer_kwargs.compute_dtype = args.dtype
    if args.remat:
        cfg.model.generator.synthesis_kwargs.remat = True
        cfg.model.discriminator.layer_kwargs.remat = True

    mesh = make_mesh(jax.devices()[:1])
    t = Trainer(cfg, mesh=mesh)
    state = t.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    res = t.resolution
    batch = {
        "depth": jnp.asarray(rng.uniform(2.0, 79.0, (args.batch, 1, *res)).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(args.batch, 1, *res) > 0.1).astype(np.float32)),
    }

    def timed(iteration0, label):
        nonlocal state
        # warm up / compile this step variant
        state, m = t.step(state, batch, jax.random.PRNGKey(1), iteration0)
        jax.device_get(m)  # data-fetch fence: block_until_ready can return unfenced on this tunnel (r5)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = t.step(
                state, batch, jax.random.PRNGKey(2 + i), iteration0 + i * 48
            )
        jax.device_get(m)  # data-fetch fence: block_until_ready can return unfenced on this tunnel (r5)
        dt = (time.perf_counter() - t0) / args.iters
        # FLOPs of the jitted variant via XLA cost analysis
        blur_sigma, dropout_ratio = t.warmup_params(iteration0)
        fn, *_ = t.get_step_fn(
            iteration0, skip_warmup=(dropout_ratio == 0.0 and blur_sigma == 0.0)
        )
        flops = 0.0
        try:
            blur = jnp.zeros((1,))
            lowered = fn.lower(
                state, batch, jax.random.PRNGKey(0), np.uint32(iteration0),
                jnp.asarray(0.999, jnp.float32), jnp.asarray(0.0, jnp.float32), blur,
                t.pe_cache_for(state),
            )
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception as e:
            print(f"# cost_analysis unavailable for {label}: {e}", file=sys.stderr)
        peak = _device_peak()
        rec = {
            "step": label,
            "dtype": args.dtype,
            "batch": args.batch,
            "step_ms": round(1e3 * dt, 2),
            "imgs_per_sec": round(args.batch / dt, 1),
            "flops_per_step": round(flops) if flops else None,
            "mfu_pct": round(100 * flops / dt / peak, 2) if flops and peak else None,
            "device": jax.devices()[0].device_kind,
        }
        print(json.dumps(rec))
        return rec

    # the shipped schedule: adv-only steps dominate (lazy pl=4, gp=16)
    variants = {
        "adv_only": 3,              # 3 % 4 != 0, 3 % 16 != 0 (warmup ACTIVE)
        "adv+pl+ada": 4,            # pl every 4, ada every 4
        "adv+pl+r1+ada": 16,        # r1 every 16
        # steady state: past the warmup fade (>99% of the 25M-img schedule) the
        # skip-warmup variant drops the per-sample dropout-mask RNG work
        "adv_only_steady": 1_000_003,
    }
    if args.ab_shift:
        from dusty_gan_v2_tpu.ops import shift as _shift

        name = args.only or "adv_only_steady"
        it = variants[name]
        for mode in ("matmul", "gather", "matmul2", "gather2"):
            _shift.set_shift_impl("gather" if mode.startswith("gather") else "matmul")
            t = Trainer(cfg, mesh=mesh)
            state = t.init_state(jax.random.PRNGKey(0))
            timed(it, f"{name}[shift_{mode}]")
        _shift.set_shift_impl("matmul")
        return
    if args.ab_pecache:
        name = args.only or "adv_only_steady"
        it = variants[name]
        for mode in ("on", "off", "on2", "off2"):
            t = Trainer(cfg, mesh=mesh)
            t.use_pe_cache = t.use_pe_cache and not mode.startswith("off")
            state = t.init_state(jax.random.PRNGKey(0))
            timed(it, f"{name}[pecache_{mode}]")
        return
    if args.ab_blurconv:
        import os

        name = args.only or "adv_only_steady"
        it = variants[name]
        for mode in ("on", "off", "on2", "off2"):
            if mode.startswith("off"):
                os.environ["DUSTY_TPU_DISABLE_BLURCONV"] = "1"
            else:
                os.environ.pop("DUSTY_TPU_DISABLE_BLURCONV", None)
            t = Trainer(cfg, mesh=mesh)
            state = t.init_state(jax.random.PRNGKey(0))
            timed(it, f"{name}[blurconv_{mode}]")
        return
    for name, it in variants.items():
        if args.only is None or name == args.only:
            timed(it, name)

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                state, m = t.step(state, batch, jax.random.PRNGKey(50 + i), 3)
            jax.device_get(m)  # data-fetch fence: block_until_ready can return unfenced on this tunnel (r5)
        print(f"# xprof trace written to {args.profile}")


if __name__ == "__main__":
    main()
