"""Decompose the sampling batch wall-clock (eval path, bf16 B=128 by default).

Same in-program fori_loop timing pattern as bench_step_parts.py (the only reliable
pattern on the tunneled setup). Parts:
  - mapping network + truncation (z -> ws)
  - synthesis network (ws -> heads)
  - full generator (incl. gumbel raydrop measurement)
  - isolated op floors: one skip-path resample (B,2,64,512 f32), one head einsum

    python scripts/bench_sampling_parts.py [--batch 128] [--dtype bfloat16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPS = 10


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _angle, _full_gen_cfg
    from dusty_gan_v2_tpu.models import build_generator
    from dusty_gan_v2_tpu.models.dusty_v2 import MappingNetwork, SynthesisNetwork
    from dusty_gan_v2_tpu.ops import make_resample, resample

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    B = args.batch
    res = (64, 512)

    cfg = _full_gen_cfg(resolution=res)
    cfg["compute_dtype"] = args.dtype
    G = build_generator(cfg)
    angle = _angle(res)
    z0 = jax.random.normal(jax.random.PRNGKey(0), (B, 512))
    variables = G.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        jnp.zeros((2, 512)), angle,
    )
    noise0 = jax.random.logistic(jax.random.PRNGKey(2), (B, 1, *res))

    mapping = MappingNetwork(**cfg["mapping_kwargs"])
    syn_kwargs = dict(cfg["synthesis_kwargs"])
    syn_kwargs["compute_dtype"] = args.dtype
    synthesis = SynthesisNetwork(**syn_kwargs)
    map_vars = {"params": variables["params"]["mapping_network"]}
    syn_vars = {
        "params": variables["params"]["synthesis_network"],
        "stats": variables.get("stats", {}).get("synthesis_network", {}),
        "consts": variables.get("consts", {}).get("synthesis_network", {}),
    }
    ws0 = jnp.broadcast_to(
        mapping.apply(map_vars, z0)[:, None, :], (B, synthesis.num_styles, 512)
    )

    def full_fn(s, ops):
        o = G.apply(
            ops["v"], ops["z"] + s, angle, truncation_psi=0.7, gumbel_noise=ops["n"]
        )
        return jnp.mean(o["image"])

    def map_fn(s, ops):
        return jnp.mean(mapping.apply(ops["v"], ops["z"] + s))

    def syn_fn(s, ops):
        o = synthesis.apply(ops["v"], ops["w"] + s, angle)
        return jnp.mean(o["image"])

    skip0 = jax.random.normal(jax.random.PRNGKey(3), (B, 2, 32, 256), jnp.float32)
    up = make_resample(up=2, window=(1, 3, 3, 1), ring=True)

    def skip_fn(s, ops):
        return jnp.mean(resample(ops["x"] + s, up))

    wh = jax.random.normal(jax.random.PRNGKey(4), (B, 1, 32), jnp.dtype(args.dtype))
    hh = jax.random.normal(jax.random.PRNGKey(5), (B, 32, *res), jnp.dtype(args.dtype))

    def head_fn(s, ops):
        y = jnp.einsum(
            "boi,bihw->bohw", ops["w"], ops["x"] + s,
            preferred_element_type=jnp.float32,
        )
        return jnp.mean(y)

    def loop(fn, cast=jnp.float32):
        # operands enter as jit ARGUMENTS (closed-over constants are embedded in the
        # remote-compile payload and trip its size limit)
        def run(ops):
            def body(i, s):
                return fn((s * 1e-9).astype(cast), ops).astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.asarray(0, jnp.float32))

        return jax.jit(run)

    parts = {
        "mapping (z->w)": (loop(map_fn), {"v": map_vars, "z": z0}),
        "synthesis (ws->heads)": (loop(syn_fn), {"v": syn_vars, "w": ws0}),
        "full G (incl. raydrop)": (
            loop(full_fn), {"v": variables, "z": z0, "n": noise0},
        ),
        "1 skip resample 2ch f32": (loop(skip_fn), {"x": skip0}),
        "1 head einsum 32->1": (
            loop(head_fn, jnp.dtype(args.dtype)), {"w": wh, "x": hh},
        ),
    }
    for name, (f, ops) in parts.items():
        _ = float(f(ops))
        t0 = time.perf_counter()
        _ = float(f(ops))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:>26}: {1e3 * dt:8.2f} ms")


if __name__ == "__main__":
    main()
