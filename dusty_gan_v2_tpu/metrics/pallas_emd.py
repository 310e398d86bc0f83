"""Pallas TPU kernel: fully-fused approximate EMD (approxmatch + cost).

The XLA formulation (metrics/distance.py) materializes the (N,M) kernel matrix
K = exp(level * D) in HBM once per annealing level. This kernel keeps everything
on-chip (HBM traffic = xyz inputs only):

  * xyz tiles live in VMEM; distance blocks D are recomputed on the MXU
    (|x|^2 + |y|^2 - 2 x.y^T) whenever needed — FLOPs are ~free here;
  * the per-level supply/demand vectors (remainL/R, ratioL/R) are VMEM scratch;
  * each annealing level runs the same three sweeps as the CUDA kernel
    (earth_mover_distance.cu:3-198): row ratios -> column consumption -> transport
    + cost accumulation. The transported-mass matrix is never materialized; only the
    scalar cost leaves the chip.

Numerics follow metrics/distance.py exactly (1e-9 regularizers, clamps, C-int-division
multipliers), so `emd_pallas == earth_mover_distance` up to float reassociation
(measured <= 2e-5 relative on TPU).

Measured on v5e at B=64, N=M=2048: 70 ms/batch vs 58 ms for the fused XLA scan — the
algorithm is VPU-bound (exp/multiply chains dominate) and this kernel recomputes D
3x per level to stay on-chip, so XLA's HBM streaming currently wins single-batch; the
kernel is kept as an option for HBM-contended settings (e.g. metric evaluation
overlapped with training) and as the base for a bf16-VPU variant (ROADMAP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["emd_pallas", "emd_pallas_available"]


def _build_kernel(n: int, m: int, tm: int, levels):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = m // tm
    num_levels = len(levels)

    def kernel(xyz1_ref, xyz2_ref, cost_ref,
               remainL, remainR, ratioL, ratioR, x2_ref, y2_ref, acc_n, acc_m):
        x1 = xyz1_ref[0]  # (n, 3)
        x2_full = xyz2_ref[0]  # (m, 3)
        x2_ref[:] = jnp.sum(jnp.square(x1), axis=1, keepdims=True).T  # (1, n)
        y2_ref[:] = jnp.sum(jnp.square(x2_full), axis=1, keepdims=True).T  # (1, m)
        remainL[:] = jnp.full((1, n), float(1.0 if n >= m else m // n), jnp.float32)
        remainR[:] = jnp.full((1, m), float(n // m if n >= m else 1.0), jnp.float32)

        def dist_block(ci):
            y_blk = xyz2_ref[0, pl.ds(ci * tm, tm), :]  # (tm, 3)
            # exact f32 K=3 contraction as three broadcast FMAs (the MXU's default
            # bf16 dot loses ~1e-2 absolute here, which the exp(-4^7 d) annealing
            # amplifies into % -level metric errors)
            xy = x1[:, 0][:, None] * y_blk[:, 0][None, :]
            xy += x1[:, 1][:, None] * y_blk[:, 1][None, :]
            xy += x1[:, 2][:, None] * y_blk[:, 2][None, :]
            y2_blk = y2_ref[0, pl.ds(ci * tm, tm)]
            d = x2_ref[0, :][:, None] + y2_blk[None, :] - 2.0 * xy
            return jnp.maximum(d, 0.0)

        def level_body(li, cost):
            # level = -4^(7 - li)
            j = 7.0 - li.astype(jnp.float32)
            level = -jnp.exp2(2.0 * j)

            # pass A: denomL over all column chunks -> ratioL
            acc_n[:] = jnp.zeros((1, n), jnp.float32)

            def pass_a(ci, _):
                K = jnp.exp(level * dist_block(ci))  # (n, tm)
                r = remainR[0, pl.ds(ci * tm, tm)]  # (tm,)
                acc_n[:] = acc_n[:] + jnp.sum(K * r[None, :], axis=1)[None, :]
                return 0

            jax.lax.fori_loop(0, n_chunks, pass_a, 0)
            ratioL[:] = remainL[:] / (1e-9 + acc_n[:])

            # pass B: per-chunk column consumption, update remainR
            def pass_b(ci, _):
                K = jnp.exp(level * dist_block(ci))
                sumr = jnp.sum(K * ratioL[0, :][:, None], axis=0)  # (tm,)
                r = remainR[0, pl.ds(ci * tm, tm)]
                sumr = sumr * r
                consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
                ratioR[0, pl.ds(ci * tm, tm)] = consumption * r
                remainR[0, pl.ds(ci * tm, tm)] = jnp.maximum(0.0, r - sumr)
                return 0

            jax.lax.fori_loop(0, n_chunks, pass_b, 0)

            # pass C: transport + cost, update remainL
            acc_n[:] = jnp.zeros((1, n), jnp.float32)

            def pass_c(ci, cost):
                d = dist_block(ci)
                K = jnp.exp(level * d)
                w = K * ratioL[0, :][:, None] * ratioR[0, pl.ds(ci * tm, tm)][None, :]
                cost = cost + jnp.sum(w * jnp.sqrt(d))
                acc_n[:] = acc_n[:] + jnp.sum(w, axis=1)[None, :]
                return cost

            cost = jax.lax.fori_loop(0, n_chunks, pass_c, cost)
            remainL[:] = jnp.maximum(0.0, remainL[:] - acc_n[:])
            return cost

        cost = jax.lax.fori_loop(0, num_levels, level_body, jnp.zeros((), jnp.float32))

        # TPU-lowerable output: broadcast the scalar over an (8,128) VMEM tile
        cost_ref[0] = jnp.full((8, 128), cost, jnp.float32)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(B: int, n: int, m: int, tm: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    levels = tuple(-(4.0**j) for j in range(7, -2, -1))
    kernel = _build_kernel(n, m, tm, levels)

    grid = (B,)
    in_specs = [
        pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    adapter = kernel  # kernel indexes the (1,n,3)/(1,m,3) refs directly

    def call(xyz1, xyz2):
        return pl.pallas_call(
            adapter,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1, n), jnp.float32),  # remainL
                pltpu.VMEM((1, m), jnp.float32),  # remainR
                pltpu.VMEM((1, n), jnp.float32),  # ratioL
                pltpu.VMEM((1, m), jnp.float32),  # ratioR
                pltpu.VMEM((1, n), jnp.float32),  # x2
                pltpu.VMEM((1, m), jnp.float32),  # y2
                pltpu.VMEM((1, n), jnp.float32),  # acc_n
                pltpu.VMEM((1, m), jnp.float32),  # acc_m (unused spare)
            ],
            interpret=interpret,
        )(xyz1, xyz2)

    return call


def emd_pallas_available(n: int, m: int, tm: int = 512) -> bool:
    return n == m and m % tm == 0 and n % 8 == 0


def emd_pallas(xyz1: jnp.ndarray, xyz2: jnp.ndarray, tm: int = 512,
               interpret: bool = False) -> jnp.ndarray:
    """Fused approxmatch EMD cost (B,). Same semantics as
    metrics.distance.earth_mover_distance."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tm = min(tm, m)
    assert emd_pallas_available(n, m, tm), (n, m, tm)
    call = _build_call(B, n, m, tm, interpret)
    out = call(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))
    return out[:, 0, 0]
