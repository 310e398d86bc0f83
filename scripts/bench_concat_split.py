"""Concat-contraction vs split-contraction for the PE-consuming modconvs.

Every SynthesisBlock conv1 contracts per-sample modulated weights against
x = concat(h_per_sample, broadcast_B(pe_batch1)). The concat materializes a
(B, in+pe, H, W) tensor (~6.7 GB/batch over the 5 blocks at sampling config),
although the PE half is the SAME batch-1 volume for every sample. The split
formulation y = W_h @ h + W_pe @ pe keeps PE batch-1 (a single (B*O, 2n) x
(2n, HW) matmul) and never materializes the concat.

    python scripts/bench_concat_split.py [--batch 128] [--dtype bfloat16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPS = 10


def main():
    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    B = args.batch
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)

    # (in_h, mid, H, W) for blocks 1..4 of the shipped config + block 0 (PE only)
    shapes = [
        (0, 512, 4, 32),
        (512, 256, 8, 64),
        (256, 128, 16, 128),
        (128, 64, 32, 256),
        (64, 32, 64, 512),
    ]
    PE = 512

    def loop(fn):
        # arrays enter as jit ARGUMENTS: closed-over constants are embedded in the
        # compile payload and trip the remote-compile size limit at the big shapes
        def run(h, pe, wb):
            def body(i, s):
                return fn((s * 1e-9).astype(dtype), h, pe, wb)

            return jax.lax.fori_loop(0, REPS, body, jnp.asarray(0, jnp.float32))

        return jax.jit(run)

    for in_h, mid, H, W in shapes:
        k = jax.random.fold_in(key, mid)
        h = (
            jax.random.normal(k, (B, in_h, H, W), dtype)
            if in_h
            else jnp.zeros((B, 0, H, W), dtype)
        )
        pe = jax.random.normal(k, (1, PE, H, W), dtype)
        wb = jax.random.normal(k, (B, mid, in_h + PE), dtype) * 0.02

        def concat_fn(s, h, pe, wb):
            peb = jnp.broadcast_to(pe + s, (B, *pe.shape[1:]))
            x = jnp.concatenate([h, peb], axis=1)
            y = jnp.einsum(
                "boi,bihw->bohw", wb, x, preferred_element_type=jnp.float32
            ).astype(dtype)
            return jnp.mean(y.astype(jnp.float32))

        def split_fn(s, h, pe, wb, in_h=in_h, mid=mid, H=H, W=W):
            w_pe = wb[:, :, in_h:]
            # shared rhs: (B*mid, PE) @ (PE, H*W)
            y = (
                (w_pe.reshape(B * mid, PE) @ (pe + s).reshape(PE, H * W))
                .reshape(B, mid, H, W)
                .astype(dtype)
            )
            if in_h:
                y = y + jnp.einsum(
                    "boi,bihw->bohw", wb[:, :, :in_h], h,
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
            return jnp.mean(y.astype(jnp.float32))

        for name, fn in [("concat", concat_fn), ("split ", split_fn)]:
            f = loop(fn)
            _ = float(f(h, pe, wb))
            t0 = time.perf_counter()
            _ = float(f(h, pe, wb))
            dt = (time.perf_counter() - t0) / REPS
            print(f"{in_h:4d}+{PE}ch -> {mid:3d} @ {H:2d}x{W:<3d} {name}: "
                  f"{1e3 * dt:7.2f} ms")


if __name__ == "__main__":
    main()
