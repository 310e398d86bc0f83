"""Run the FULL 2048x2048x3 1-NNA-EMD protocol on-chip, measured (not extrapolated).

Reference `test_gan.py:228-237` computes COV/MMD/1-NNA over EMD on 2048 generated
vs 2048 real clouds (2048 pts each) and notes the stage takes "> 1h" on all its
GPUs. This script grounds the number on one TPU chip end-to-end through the
PRODUCTION path (`metrics/cov_mmd_1nna._pairwise_distance` -> Pallas approxmatch):
it generates both 2048-cloud sets through the real generate->point_set->FPS
pipeline (demo checkpoint — metric VALUES are random-weight outputs, the
wall-clock is real), then times the three pairwise matrices rr/rg/gg with
periodic synced throughput checkpoints.

Budget-aware: each completed matrix is saved to `artifacts/emd_protocol/` and the
running log (pairs/s at protocol scale) is appended to progress.jsonl, so an
interrupted run still yields a MEASURED at-scale rate instead of a 64-pair
microbench extrapolation. If all three matrices complete, the full COV/MMD/1-NNA
scores and total wall-clock are written to summary.json.

    python scripts/bench_emd_protocol.py [--budget_s 7200] [--num_subsample 2048]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


class _BudgetExceeded(Exception):
    pass


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", default=None, help="default: fresh demo ckpt")
    p.add_argument("--num_subsample", type=int, default=2048)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--pairwise_batch", type=int, default=256)
    p.add_argument("--budget_s", type=float, default=7200.0)
    p.add_argument("--sync_every_pairs", type=int, default=65536,
                   help="throughput checkpoint cadence (~27 s at the measured "
                        "~2400 pairs/s)")
    p.add_argument("--out_dir", default="artifacts/emd_protocol")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="load already-saved M_<name>.npy matrices instead of recomputing")
    args = p.parse_args()

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir / "progress.jsonl"

    def log(rec):
        rec["t"] = round(time.time() - T0, 1)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    T0 = time.time()

    if args.resume and all(
        (out_dir / f"M_{n}.npy").exists() for n in ("rr", "rg", "gg")
    ):
        # scores-only rerun: every matrix is on disk, the clouds are dead —
        # skip the whole generate+FPS stage (ckpt load, compile, 128 batches)
        mats = {n: np.load(out_dir / f"M_{n}.npy") for n in ("rr", "rg", "gg")}
        from dusty_gan_v2_tpu.metrics.cov_mmd_1nna import (
            _compute_cov_mmd, _compute_nna,
        )

        scores = {f"{k}-emd": v for k, v in _compute_cov_mmd(mats["rg"]).items()}
        for k, v in _compute_nna(mats["rr"], mats["rg"], mats["gg"], k=1).items():
            scores[f"1-nn-{k}-emd"] = v
        summary = {"completed_matrices": sorted(mats), "resumed_all": True,
                   "num_subsample": args.num_subsample,
                   "num_points": args.num_points,
                   "pairwise_batch": args.pairwise_batch, "scores": scores}
        with open(out_dir / "summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        log({"summary": summary})
        return

    # ---- build the two 2048-cloud sets through the production pipeline ----
    from dusty_gan_v2_tpu.geometry import CoordBridge
    from dusty_gan_v2_tpu.metrics import downsample_point_clouds
    from dusty_gan_v2_tpu.models import build_generator
    from dusty_gan_v2_tpu.pretrained import autoload_ckpt
    from dusty_gan_v2_tpu.utils import tanh_to_sigmoid

    if args.ckpt_path is None:
        # a SUBPROCESS creates the checkpoint: make_demo_ckpt.py forces
        # jax_platforms=cpu process-wide, which cannot be done here after the
        # TPU backend is up (an in-process default_device(cpu) Trainer init
        # deadlocks against the mesh commit in init_state)
        import subprocess

        ckpt_path = str(out_dir / "demo_ckpt.msgpack")
        if not Path(ckpt_path).exists():
            subprocess.run(
                [sys.executable, str(Path(__file__).parent / "make_demo_ckpt.py"),
                 "--out", ckpt_path, "--data_root", "/tmp/unused",
                 "--seed", str(args.seed)],
                check=True,
            )
        args.ckpt_path = ckpt_path

    def mark(msg):
        print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)

    mark("loading ckpt")
    ckpt = autoload_ckpt(args.ckpt_path)
    mark("ckpt loaded")
    cfg = ckpt["cfg"]
    H, W = cfg.model.generator.synthesis_kwargs.resolution
    angle = jnp.asarray(ckpt["angle"])
    coord = CoordBridge(
        num_ring=H, num_points=W,
        min_depth=cfg.dataset.min_depth, max_depth=cfg.dataset.max_depth,
        angle=np.asarray(ckpt["angle"]),
    )
    G = build_generator(cfg.model.generator)
    g_vars = ckpt["G_ema"]
    z_dim = cfg.model.generator.mapping_kwargs.in_ch

    u = np.clip(np.random.RandomState(args.seed).rand(1, 1, H, W), 1e-6, 1 - 1e-6)
    fixed_logistic = jnp.asarray((np.log(u) - np.log1p(-u)).astype(np.float32))

    # commit weights to device ONCE (closing the jit over host numpy arrays
    # would re-ship them per dispatch through the tunnel)
    g_vars = jax.device_put(g_vars)
    angle_d = jax.device_put(jnp.asarray(angle))
    mark("weights on device")

    from dusty_gan_v2_tpu.models import build_pe_cache

    pe_cache = build_pe_cache(G, g_vars, angle_d)  # hoisted PE pyramid (r5)

    @jax.jit
    def gen_clouds(z):
        kw = {} if pe_cache is None else {"pe_cache": pe_cache}
        img = G.apply(g_vars, z, angle_d, gumbel_noise=fixed_logistic, **kw)["image"]
        inv = jnp.clip(tanh_to_sigmoid(img), 0, 1)
        pts = coord.convert(inv, "inv_depth_norm", "point_set") / coord.max_depth
        return downsample_point_clouds(pts, args.num_points)

    def collect(seed, n, bs=64):
        rng = jax.random.PRNGKey(seed)
        outs = []
        for i in range(0, n, bs):
            rng, k = jax.random.split(rng)
            outs.append(gen_clouds(jax.random.normal(k, (bs, z_dim))))
            if i == 0:
                jax.block_until_ready(outs[0])
                mark("first gen batch done (compile incl.)")
        return np.concatenate(jax.device_get(outs))[:n]

    t = time.time()
    pcs_gen = collect(args.seed, args.num_subsample)
    pcs_ref = collect(args.seed + 1, args.num_subsample)
    log({"stage": "generate+fps", "sec": round(time.time() - t, 1),
         "clouds": 2 * args.num_subsample, "pts": args.num_points})

    # one upload each for all three matrices (committed device arrays make the
    # per-matrix device_put inside _pairwise_distance a no-op)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dusty_gan_v2_tpu.parallel import make_mesh

    repl = NamedSharding(make_mesh(), P())
    pcs_gen = jax.device_put(pcs_gen, repl)
    pcs_ref = jax.device_put(pcs_ref, repl)

    # ---- the three timed matrices, production path ----
    from dusty_gan_v2_tpu.metrics.cov_mmd_1nna import (
        _compute_cov_mmd, _compute_nna, _pairwise_distance,
    )

    mats = {}
    state = {}

    def run_matrix(name, a, b):
        saved = out_dir / f"M_{name}.npy"
        if args.resume and saved.exists():
            mats[name] = np.load(saved)
            log({"matrix": name, "resumed": True, "pairs": mats[name].size})
            return
        t_start = time.time()
        state.update(last_sync_t=t_start, last_sync_pairs=0, t_start=t_start)

        def progress(done, total, last_val):
            now = time.time()
            # fence by PAIR COUNT, not wall time: with large chunks the host
            # dispatches the whole matrix in seconds, so a wall-time cadence
            # never fires until the final done>=total sync blocks ~30 min with
            # zero interim telemetry (observed r5 at --pairwise_batch 2048)
            if (done - state["last_sync_pairs"] >= args.sync_every_pairs
                    or done >= total):
                np.asarray(last_val)  # true throughput checkpoint: DATA fetch —
                # block_until_ready can return unfenced on this tunnel (r5)
                now = time.time()
                dp = done - state["last_sync_pairs"]
                dt_i = max(now - state["last_sync_t"], 1e-6)  # final sync can land
                # in the same timestamp as a just-completed periodic one
                log({"matrix": name, "pairs": done, "total": total,
                     "pairs_per_s_interval": round(dp / dt_i, 1),
                     "pairs_per_s_cum": round(done / max(now - state["t_start"], 1e-6), 1)})
                state.update(last_sync_t=now, last_sync_pairs=done)
            if time.time() - T0 > args.budget_s:
                raise _BudgetExceeded(f"{name}: {done}/{total} pairs")

        out = _pairwise_distance(a, b, args.pairwise_batch, ("emd",),
                                 progress=progress)["emd"]
        dt = time.time() - t_start
        np.save(out_dir / f"M_{name}.npy", out)
        log({"matrix": name, "done": True, "sec": round(dt, 1),
             "pairs": out.size, "pairs_per_s": round(out.size / dt, 1)})
        mats[name] = out

    try:
        run_matrix("rr", pcs_ref, pcs_ref)
        run_matrix("rg", pcs_ref, pcs_gen)
        run_matrix("gg", pcs_gen, pcs_gen)
    except _BudgetExceeded as e:
        log({"aborted": str(e), "budget_s": args.budget_s})

    summary = {"completed_matrices": sorted(mats), "wall_s": round(time.time() - T0, 1),
               "num_subsample": args.num_subsample, "num_points": args.num_points,
               "pairwise_batch": args.pairwise_batch,
               "device": str(jax.devices()[0].device_kind)}
    if len(mats) == 3:
        scores = {}
        for k, v in _compute_cov_mmd(mats["rg"]).items():
            scores[f"{k}-emd"] = v
        for k, v in _compute_nna(mats["rr"], mats["rg"], mats["gg"], k=1).items():
            scores[f"1-nn-{k}-emd"] = v
        summary["scores"] = scores
    with open(out_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    log({"summary": summary})


if __name__ == "__main__":
    main()
