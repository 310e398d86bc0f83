"""NCHW vs NHWC activation layout for the synthesis trunk — microbenchmark.

Motivation (see BASELINE.md sampling bisection): in NCHW the per-block FIR
up-resamples cost ~31% of the sampling batch because the small spatial planes
(4x32 .. 32x256) pad to (8,128) TPU tiles. In NHWC the last-two dims are (W, C)
with C in the lane dim (512..32 channels), so early blocks tile compactly.

This bench runs the trunk compute of the shipped dusty_v2 generator (resample-up,
PE concat, two modulated 1x1 convs via per-sample matmul, bias+leaky, 2-ch head)
in both layouts at sampling config (B=128, bf16) and training config (B=32, f32),
using the production resample matrices.

    python scripts/bench_layout.py [--batch 128] [--dtype bfloat16]
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

    from dusty_gan_v2_tpu.ops.resample import _resample_matrices, make_resample

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    B = args.batch
    dtype = jnp.dtype(args.dtype)

    # shipped dusty_v2: ch_base=32 ch_max=512 layers=(2,2,2,2) res 64x512, pe 512
    chs = [512, 256, 128, 64, 32]
    ress = [(4, 32), (8, 64), (16, 128), (32, 256), (64, 512)]
    PE = 512
    up = make_resample(up=2, window=(1, 3, 3, 1), ring=True)

    key = jax.random.PRNGKey(0)

    def make_params():
        # weights are (O, I) with per-sample (B, I) styles, modulated on the fly —
        # matching the real ModConv2d HBM traffic (a (B,O,I) tensor in HBM would be
        # ~134 MB at block 0 and would dominate the measurement)
        ps = []
        for i, (mid, (H, W)) in enumerate(zip(chs, ress)):
            cin = (chs[i - 1] if i else 0) + PE
            k = jax.random.fold_in(key, i)
            ps.append(
                dict(
                    w1=jax.random.normal(k, (mid, cin), dtype) * 0.05,
                    s1=jax.random.normal(k, (B, cin), dtype) * 0.1,
                    w2=jax.random.normal(k, (mid, mid), dtype) * 0.05,
                    s2=jax.random.normal(k, (B, mid), dtype) * 0.1,
                    wh=jax.random.normal(k, (2, mid), dtype) * 0.05,
                    sh=jax.random.normal(k, (B, mid), dtype) * 0.1,
                    b1=jnp.zeros((mid,), dtype),
                    b2=jnp.zeros((mid,), dtype),
                    pe=jax.random.normal(k, (1, PE, H, W), dtype),
                )
            )
        return ps

    params = make_params()

    def modw(w, s):
        """StyleGAN2 modulate + demodulate -> per-sample (B, O, I) weights."""
        wb = w[None] * (1.0 + s[:, None, :])
        return wb * jax.lax.rsqrt(
            jnp.sum(jnp.square(wb), axis=2, keepdims=True) + 1e-8
        )

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x) * 1.4142135

    def mats(H, W):
        Hm, Wm = _resample_matrices(up, H, W)
        return Hm.astype(dtype), Wm.astype(dtype)

    def trunk_nchw(s):
        h = None
        skip = None
        for i, (mid, (H, W)) in enumerate(zip(chs, ress)):
            p = params[i]
            pe = p["pe"] + s
            if h is None:
                h = jnp.broadcast_to(pe, (B, PE, H, W))
            else:
                Hm, Wm = mats(H // 2, W // 2)
                h = jnp.einsum("bchw,pw->bchp", h, Wm)
                h = jnp.einsum("bchp,oh->bcop", h, Hm)
                h = jnp.concatenate([h, jnp.broadcast_to(pe, (B, PE, H, W))], axis=1)
            h = lrelu(
                jnp.einsum("boi,bihw->bohw", modw(p["w1"], p["s1"]), h)
                + p["b1"][None, :, None, None]
            )
            if i:
                h = lrelu(
                    jnp.einsum("boi,bihw->bohw", modw(p["w2"], p["s2"]), h)
                    + p["b2"][None, :, None, None]
                )
            o = jnp.einsum("boi,bihw->bohw", modw(p["wh"], p["sh"]), h).astype(
                jnp.float32
            )
            if skip is None:
                skip = o
            else:
                Hm, Wm = mats(H // 2, W // 2)
                Hm, Wm = Hm.astype(jnp.float32), Wm.astype(jnp.float32)
                sk = jnp.einsum("bchw,pw->bchp", skip, Wm)
                sk = jnp.einsum("bchp,oh->bcop", sk, Hm)
                skip = o + sk
        return jnp.mean(skip)

    def trunk_nhwc(s):
        h = None
        skip = None  # kept NCHW: 2 channels would pad lanes to 128
        for i, (mid, (H, W)) in enumerate(zip(chs, ress)):
            p = params[i]
            pe = jnp.transpose(p["pe"] + s, (0, 2, 3, 1))  # batch-1, cheap
            if h is None:
                h = jnp.broadcast_to(pe, (B, H, W, PE))
            else:
                Hm, Wm = mats(H // 2, W // 2)
                h = jnp.einsum("bhwc,pw->bhpc", h, Wm)
                h = jnp.einsum("bhpc,oh->bopc", h, Hm)
                h = jnp.concatenate([h, jnp.broadcast_to(pe, (B, H, W, PE))], axis=-1)
            h = lrelu(jnp.einsum("boi,bhwi->bhwo", modw(p["w1"], p["s1"]), h) + p["b1"])
            if i:
                h = lrelu(
                    jnp.einsum("boi,bhwi->bhwo", modw(p["w2"], p["s2"]), h) + p["b2"]
                )
            o = jnp.einsum("boi,bhwi->bohw", modw(p["wh"], p["sh"]), h).astype(
                jnp.float32
            )
            if skip is None:
                skip = o
            else:
                Hm, Wm = mats(H // 2, W // 2)
                Hm, Wm = Hm.astype(jnp.float32), Wm.astype(jnp.float32)
                sk = jnp.einsum("bchw,pw->bchp", skip, Wm)
                sk = jnp.einsum("bchp,oh->bcop", sk, Hm)
                skip = o + sk
        return jnp.mean(skip)

    def loop(fn):
        def body(i, s):
            return fn((s * 1e-9).astype(dtype))

        return jax.jit(
            lambda: jax.lax.fori_loop(0, REPS, body, jnp.asarray(0, jnp.float32))
        )

    for name, fn in [("NCHW", trunk_nchw), ("NHWC", trunk_nhwc)]:
        f = loop(fn)
        _ = float(f())
        t0 = time.perf_counter()
        _ = float(f())
        dt = (time.perf_counter() - t0) / REPS
        print(f"trunk {name}: {1e3 * dt:8.2f} ms  (B={B}, {args.dtype})")

    # resample-only, per transition shape (isolates the layout effect)
    for i in range(1, len(chs)):
        C = chs[i - 1]
        H, W = ress[i - 1]
        Hm, Wm = mats(H, W)
        x_nchw = jax.random.normal(key, (B, C, H, W), dtype)
        x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))

        def rs_nchw(s, x=x_nchw, Hm=Hm, Wm=Wm):
            y = jnp.einsum("bchw,pw->bchp", x + s, Wm)
            y = jnp.einsum("bchp,oh->bcop", y, Hm)
            return jnp.mean(y.astype(jnp.float32))

        def rs_nhwc(s, x=x_nhwc, Hm=Hm, Wm=Wm):
            y = jnp.einsum("bhwc,pw->bhpc", x + s, Wm)
            y = jnp.einsum("bhpc,oh->bopc", y, Hm)
            return jnp.mean(y.astype(jnp.float32))

        for name, fn in [("NCHW", rs_nchw), ("NHWC", rs_nhwc)]:
            f = loop(fn)
            _ = float(f())
            t0 = time.perf_counter()
            _ = float(f())
            dt = (time.perf_counter() - t0) / REPS
            print(f"resample {C:4d}ch {H:3d}x{W:<4d} {name}: {1e3 * dt:8.2f} ms")


if __name__ == "__main__":
    main()
