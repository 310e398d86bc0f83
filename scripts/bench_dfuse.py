"""Microbench: discriminator resblock-trunk formulations at training config.

The D appears 3x per adv step (G-phase D(fake), D-phase D(real)+D(fake)) and the
step is elementwise/bandwidth-bound (BASELINE.md) — this script times whole-trunk
fwd and fwd+bwd programs (big enough to sit above the ~2.5 ms fori-loop floor)
for candidate fusions of the per-resblock chain

    conv3x3 -> bias_act -> blur -> conv3x3 s2 -> bias_act   (+ skip: blur -> 1x1 s2)

Variants:
  base      — production path (conv_ring_fast + matmul-method resample)
  conv_blur — blur via depthwise-conv method instead of the einsum pair
  composite — blur folded into the following conv: main 3x3s2 -> 6x6s2 dense,
              skip 1x1s2 -> 4x4s2 dense (kernel = conv (*) outer(taps, taps));
              timing-only zero-pad boundaries (exactness would need the same
              per-edge corrections conv_ring_fast does; built only if this wins)

    python scripts/bench_dfuse.py [--batch 128] [--dtype bfloat16]
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
    from jax import lax

    from dusty_gan_v2_tpu.ops import make_resample, resample
    from dusty_gan_v2_tpu.ops.act import fused_leaky_relu
    from dusty_gan_v2_tpu.ops.fused_chain import fused_act_resample, pallas_resample
    from dusty_gan_v2_tpu.ops.pad import conv_ring_fast

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    B = args.batch

    # dusty_v2 D trunk: ch 32->64->128->256->512 over 64x512 -> 4x32
    chs = [32, 64, 128, 256, 512]
    H0, W0 = 64, 512
    rng = np.random.RandomState(0)

    def mk(shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale, dtype)

    params = []
    for i in range(4):
        ci, co = chs[i], chs[i + 1]
        params.append(
            dict(
                w1=mk((ci, ci, 3, 3)),
                b1=mk((ci,), 0.0),
                w2=mk((co, ci, 3, 3)),
                b2=mk((co,), 0.0),
                ws=mk((co, ci, 1, 1)),
            )
        )
    blur = make_resample(window=(1, 3, 3, 1), ring=True)
    taps = np.array([1, 3, 3, 1], np.float64)
    taps = taps / taps.sum()

    def block_base(x, p):
        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = fused_leaky_relu(h, p["b1"])
        h = resample(h, blur, method="matmul")
        h = conv_ring_fast(h, p["w2"], (2, 2))
        h = fused_leaky_relu(h, p["b2"])
        s = resample(x, blur, method="matmul")
        s = lax.conv_general_dilated(
            s, p["ws"], (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (h + s) * float(1 / np.sqrt(2.0))

    def block_convblur(x, p):
        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = fused_leaky_relu(h, p["b1"])
        h = resample(h, blur, method="conv")
        h = conv_ring_fast(h, p["w2"], (2, 2))
        h = fused_leaky_relu(h, p["b2"])
        s = resample(x, blur, method="conv")
        s = lax.conv_general_dilated(
            s, p["ws"], (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (h + s) * float(1 / np.sqrt(2.0))

    def composed_kernels(p):
        # main: k6[o,i,a,b] = sum_{u,v} w2[o,i,u,v] * taps[a-u] * taps[b-v]
        w2 = np.asarray(p["w2"], np.float64)
        k6 = np.zeros((*w2.shape[:2], 6, 6))
        for u in range(3):
            for v in range(3):
                for a in range(4):
                    for b in range(4):
                        k6[:, :, u + a, v + b] += w2[:, :, u, v] * taps[a] * taps[b]
        ws = np.asarray(p["ws"], np.float64)
        k4 = ws[:, :, :, :] * np.outer(taps, taps)[None, None]
        return jnp.asarray(k6, dtype), jnp.asarray(k4, dtype)

    comp = [composed_kernels(p) for p in params]

    def block_composite(x, p, k6, k4):
        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = fused_leaky_relu(h, p["b1"])
        # blur pad (2,1) + conv pad (1,1) -> composite pad (3,2); zero boundaries
        # (timing only — exact version needs per-edge corrections)
        h = lax.conv_general_dilated(
            h, k6, (2, 2), ((3, 2), (3, 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        h = fused_leaky_relu(h, p["b2"])
        s = lax.conv_general_dilated(
            x, k4, (2, 2), ((2, 1), (2, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (h + s) * float(1 / np.sqrt(2.0))

    def block_pallas(x, p):
        # act+blur fused into one Pallas kernel; skip blur single-pass
        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = fused_act_resample(h, p["b1"], blur)
        h = conv_ring_fast(h, p["w2"], (2, 2))
        h = fused_leaky_relu(h, p["b2"])
        s = pallas_resample(x, blur)
        s = lax.conv_general_dilated(
            s, p["ws"], (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (h + s) * float(1 / np.sqrt(2.0))

    def block_exact(x, p):
        # production fused path (ops/blurconv.py): composite conv + ring/replicate
        # boundary corrections + band recomputes — exact, unlike block_composite
        from dusty_gan_v2_tpu.ops.blurconv import (
            blur_conv1x1s2_ring, blur_conv3x3s2_ring,
        )

        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = fused_leaky_relu(h, p["b1"])
        h = blur_conv3x3s2_ring(h, p["w2"])
        h = fused_leaky_relu(h, p["b2"])
        s = blur_conv1x1s2_ring(x, p["ws"])
        return (h + s) * float(1 / np.sqrt(2.0))

    def block_noact(x, p):
        # acts stripped (timing only): measures what the elementwise passes cost,
        # i.e. whether XLA already fuses them away
        h = conv_ring_fast(x, p["w1"], (1, 1))
        h = resample(h, blur, method="matmul")
        h = conv_ring_fast(h, p["w2"], (2, 2))
        s = resample(x, blur, method="matmul")
        s = lax.conv_general_dilated(
            s, p["ws"], (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (h + s) * float(1 / np.sqrt(2.0))

    def trunk(fn):
        def run(x):
            h = x
            for i in range(4):
                h = fn(h, i)
            return h

        return run

    trunks = {
        "base": trunk(lambda h, i: block_base(h, params[i])),
        "exact": trunk(lambda h, i: block_exact(h, params[i])),
        "composite": trunk(lambda h, i: block_composite(h, params[i], *comp[i])),
        "pallas": trunk(lambda h, i: block_pallas(h, params[i])),
        "conv_blur": trunk(lambda h, i: block_convblur(h, params[i])),
        "noact": trunk(lambda h, i: block_noact(h, params[i])),
    }

    x = mk((B, chs[0], H0, W0), 1.0)
    k0 = jax.random.PRNGKey(7)

    def timed(label, g):
        # g: x -> scalar; serialized REPS times on a carry inside one jit.
        # x is a jit ARG (a closed-over 268MB constant blows the tunnel's
        # remote-compile request-size limit).
        jf = jax.jit(
            lambda xx: lax.fori_loop(
                0, REPS, lambda i, s: g(xx + (s * 0).astype(xx.dtype)), jnp.float32(0)
            )
        )
        _ = float(jf(x))  # compile + run
        t0 = time.perf_counter()
        _ = float(jf(x))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:>24}: {1e3 * dt:8.2f} ms")

    for name, f in trunks.items():
        timed(f"{name} fwd", lambda xx, f=f: f(xx).mean().astype(jnp.float32))
        timed(
            f"{name} fwd+bwd",
            lambda xx, f=f: jax.grad(
                lambda v: f(v).mean().astype(jnp.float32)
            )(xx).mean().astype(jnp.float32),
        )


if __name__ == "__main__":
    main()
