"""Pallas TPU kernel: fully-fused approximate EMD (approxmatch + cost).

The XLA formulation (metrics/distance.py) materializes the (N,M) distance matrix D
and sqrt(D) in HBM and streams both through every annealing level — ~2*N*M*4 bytes
x 9 levels of HBM traffic per pair; at N=M=2048 that is HBM-bound (measured 58 ms /
64 pairs on v5e).

This kernel keeps the whole working set on-chip (HBM traffic = the xyz inputs only):

  * the (N,M) kernel matrix K = exp(level * D) lives in VMEM **across the level's
    passes** (16.8 MB f32 at 2048^2 — v5e VMEM is 128 MiB), so exp runs ONCE per
    level (the old kernel recomputed D+exp 3x per level and lost to XLA);
  * D blocks are recomputed on the MXU whenever needed (|x|^2+|y|^2-2xy as a
    HIGHEST-precision dot — bf16 passes would corrupt exp(-4^7 d); FLOPs are free
    here), including a second time in the transport pass where sqrt(d) is needed;
  * all supply/demand reductions (denomL, sumr, acc_n, cost) are MXU matvecs;
    the VPU only does exp + one multiply + one sqrt per element per level;
  * per-level sweeps mirror the CUDA kernel (earth_mover_distance.cu:3-198):
    pass A row ratios -> fused pass B+C column consumption + transport + cost.

Numerics follow metrics/distance.py exactly (1e-9 regularizers, clamps,
C-int-division multipliers); parity with the XLA path is tested in interpret mode
and measured <= 1e-4 relative on TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["emd_pallas", "emd_pallas_available"]

_LOG2E = 1.4426950408889634  # exp(x) == exp2(x * log2(e)); exp2 is the native op


def _build_kernel(n: int, m: int, tm: int, num_levels: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = m // tm

    def kernel(xyz1_ref, xyz2_ref, cost_ref,
               K_ref, remainL, remainR, ratioL, ratioR, x2_ref, y2_ref, acc_n):
        x1 = xyz1_ref[0]  # (n, 3)
        x2_full = xyz2_ref[0]  # (m, 3)
        x2_ref[:] = jnp.sum(jnp.square(x1), axis=1, keepdims=True).T  # (1, n)
        y2_ref[:] = jnp.sum(jnp.square(x2_full), axis=1, keepdims=True).T  # (1, m)
        remainL[:] = jnp.full((1, n), float(1.0 if n >= m else m // n), jnp.float32)
        remainR[:] = jnp.full((1, m), float(n // m if n >= m else 1.0), jnp.float32)

        def dist_block(ci):
            y_blk = xyz2_ref[0, pl.ds(ci * tm, tm), :]  # (tm, 3)
            xy = jax.lax.dot_general(
                x1, y_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (n, tm) on the MXU; f32-exact (3 bf16 passes)
            y2_blk = y2_ref[0, pl.ds(ci * tm, tm)]
            d = x2_ref[0, :][:, None] + y2_blk[None, :] - 2.0 * xy
            return jnp.maximum(d, 0.0)

        def level_body(li, cost):
            # level = -4^(7 - li); exp(level*d) computed as exp2(level2*d)
            j = 7.0 - li.astype(jnp.float32)
            level2 = -jnp.exp2(2.0 * j) * _LOG2E

            # pass A: build K for this level (once), accumulate denomL -> ratioL
            def pass_a(ci, _):
                k = jnp.exp2(level2 * dist_block(ci))  # (n, tm)
                K_ref[:, pl.ds(ci * tm, tm)] = k
                r = remainR[0, pl.ds(ci * tm, tm)][:, None]  # (tm, 1)
                kv = jax.lax.dot_general(
                    k, r, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (n, 1)
                acc_n[:] = acc_n[:] + kv.T
                return 0

            acc_n[:] = jnp.zeros((1, n), jnp.float32)
            jax.lax.fori_loop(0, n_chunks, pass_a, 0, unroll=True)
            ratioL[:] = remainL[:] / (1e-9 + acc_n[:])

            # fused pass B+C per chunk: column consumption, then transport + cost,
            # reusing the K tile resident in VMEM (no second exp)
            acc_n[:] = jnp.zeros((1, n), jnp.float32)

            def pass_bc(ci, cost):
                k = K_ref[:, pl.ds(ci * tm, tm)]  # (n, tm)
                r = remainR[0, pl.ds(ci * tm, tm)]  # (tm,)
                sumr = jax.lax.dot_general(
                    ratioL[:], k, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )[0]  # (tm,)
                sumr = sumr * r
                consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
                rr = consumption * r  # ratioR for this chunk
                remainR[0, pl.ds(ci * tm, tm)] = jnp.maximum(0.0, r - sumr)

                # transport: w = k * ratioL^T rr; never materialized —
                #   cost  += ratioL @ (k ⊙ sqrt(d)) @ rr
                #   acc_n += ratioL ⊙ (k @ rr)      (row sums of w)
                d = dist_block(ci)  # recomputed on MXU; sqrt needs d, K does not
                ks = k * jnp.sqrt(d)
                tmp = jax.lax.dot_general(
                    ratioL[:], ks, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (1, tm)
                cost = cost + jnp.sum(tmp[0] * rr)
                krr = jax.lax.dot_general(
                    k, rr[:, None], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (n, 1)
                acc_n[:] = acc_n[:] + krr.T
                return cost

            cost = jax.lax.fori_loop(0, n_chunks, pass_bc, cost, unroll=True)
            remainL[:] = jnp.maximum(0.0, remainL[:] - ratioL[:] * acc_n[:])
            return cost

        cost = jax.lax.fori_loop(0, num_levels, level_body, jnp.zeros((), jnp.float32))

        # TPU-lowerable output: broadcast the scalar over an (8,128) VMEM tile
        cost_ref[0] = jnp.full((8, 128), cost, jnp.float32)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(B: int, n: int, m: int, tm: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_kernel(n, m, tm, num_levels=9)

    grid = (B,)
    in_specs = [
        pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def call(xyz1, xyz2):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n, m), jnp.float32),  # K, resident across passes
                pltpu.VMEM((1, n), jnp.float32),  # remainL
                pltpu.VMEM((1, m), jnp.float32),  # remainR
                pltpu.VMEM((1, n), jnp.float32),  # ratioL
                pltpu.VMEM((1, m), jnp.float32),  # ratioR (spare)
                pltpu.VMEM((1, n), jnp.float32),  # x^2
                pltpu.VMEM((1, m), jnp.float32),  # y^2
                pltpu.VMEM((1, n), jnp.float32),  # acc_n
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
