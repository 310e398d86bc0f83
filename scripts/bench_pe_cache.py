"""Sampling-path A/B for the hoisted Fourier-PE pyramid (VERDICT r4 #4) + the
post-commute batch sweep.

The PE volumes (and the whole angle pyramid feeding them) are pure constants of
the fixed sensor grid; until r5 they were recomputed inside every jitted
sampling call. This times the shipped 64x512 dusty_v2 sampling program with and
without the precomputed cache IN ONE PROCESS (same chip window), then sweeps
the batch size with both variants (BASELINE.md's 256/512 rows predate the r2
eval resample-commute).

Timing fence: each timed loop ends with a scalar device_get (float(sum)) rather
than block_until_ready — on this tunnel block_until_ready was observed to
return without fencing execution when the device queue is congested (r5 log).

    python scripts/bench_pe_cache.py [--iters 20] [--repeats 3]
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

    from __graft_entry__ import _angle, _full_gen_cfg
    from dusty_gan_v2_tpu.models import build_generator

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--batches", type=int, nargs="+", default=[128, 256, 512])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    res = (64, 512)
    cfg = _full_gen_cfg(resolution=res)
    cfg["compute_dtype"] = args.dtype
    G = build_generator(cfg)
    angle = jax.device_put(_angle(res))
    variables = G.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        jnp.zeros((2, 512)), angle,
    )
    variables = jax.device_put(variables)
    from dusty_gan_v2_tpu.models import build_pe_cache

    cache = jax.device_put(build_pe_cache(G, variables, angle))
    cache_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize
                      for c in cache if c is not None)
    print(json.dumps({"pe_cache_mb": round(cache_bytes / 2**20, 1),
                      "blocks": len(cache)}), flush=True)

    @jax.jit
    def sample_nocache(variables, z, noise):
        o = G.apply(variables, z, angle, truncation_psi=0.7, gumbel_noise=noise)
        return o["image"]

    @jax.jit
    def sample_cache(variables, z, noise, cache):
        o = G.apply(variables, z, angle, truncation_psi=0.7, gumbel_noise=noise,
                    pe_cache=cache)
        return o["image"]

    def timed(B, use_cache, label):
        zs = [jax.random.normal(jax.random.PRNGKey(i), (B, 512)) for i in range(4)]
        noise = jax.random.logistic(jax.random.PRNGKey(9), (B, 1, *res))
        fn = ((lambda v, z, n: sample_cache(v, z, n, cache))
              if use_cache else sample_nocache)
        out = fn(variables, zs[0], noise)
        _ = float(jnp.sum(out))  # warm + fence
        reps = []
        for _r in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(variables, zs[i % 4], noise)
            _ = float(jnp.sum(out))  # execution fence (see module docstring)
            reps.append(1e3 * (time.perf_counter() - t0) / args.iters)
        best = min(reps)
        rec = {"variant": label, "batch": B, "batch_ms": round(best, 3),
               "samples_per_s": round(B / best * 1e3, 1),
               "repeat_ms": [round(r, 3) for r in reps]}
        print(json.dumps(rec), flush=True)
        return rec

    # parity spot-check on device (f32 bitwise equality is covered by CPU tests;
    # here just guard against a wiring mistake at bf16). Compare the PRE-MASK
    # image: the two variants are different compiled programs, so bf16
    # reassociation can flip the hard raydrop threshold on near-zero logits —
    # post-mask pixels then differ by +-2 without any real mismatch.
    @jax.jit
    def orig(variables, z, noise, cache):
        kw = {} if cache is None else {"pe_cache": cache}
        o = G.apply(variables, z, angle, truncation_psi=0.7, gumbel_noise=noise,
                    **kw)
        return o["image_orig"], o["raydrop_logit"]

    zt = jax.random.normal(jax.random.PRNGKey(5), (4, 512))
    nt = jax.random.logistic(jax.random.PRNGKey(6), (4, 1, *res))
    a_img, a_log = map(np.asarray, orig(variables, zt, nt, None))
    b_img, b_log = map(np.asarray, orig(variables, zt, nt, cache))
    print(json.dumps({
        "parity_image_orig_max_abs": float(np.abs(a_img - b_img).max()),
        "parity_raydrop_logit_max_abs": float(np.abs(a_log - b_log).max()),
    }), flush=True)

    for B in args.batches:
        timed(B, False, "nocache")
        timed(B, True, "pe_cache")


if __name__ == "__main__":
    main()
