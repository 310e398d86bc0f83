"""Pallas TPU kernel: fully-fused approximate EMD (approxmatch + cost).

The XLA formulation (metrics/distance.py) materializes the (N,M) distance matrix D
and sqrt(D) in HBM and streams both through every annealing level — ~2*N*M*4 bytes
x 9 levels of HBM traffic per pair; at N=M=2048 that is HBM-bound (measured 58 ms /
64 pairs on v5e).

This kernel keeps the whole working set on-chip (HBM traffic = the xyz inputs only):

  * the (N,M) kernel matrix K = exp(level * D) lives in VMEM **across the level's
    passes**, stored chunk-major (n_chunks, N, TM) so all dynamic indexing is on the
    major axis (lane-dim dynamic slices would force full-size temporaries). exp runs
    ONCE per level — the previous kernel recomputed D+exp 3x per level and lost to
    the XLA scan;
  * D blocks are recomputed on the MXU whenever needed (|x|^2+|y|^2-2xy as a
    HIGHEST-precision dot — bf16 passes would corrupt exp(-4^7 d); FLOPs are free
    here), including a second time in the transport pass where sqrt(d) is needed;
  * all supply/demand reductions (denomL, sumr, acc_n, cost) are MXU matvecs;
    the VPU only does exp + one multiply + one sqrt per element per level;
  * per-level sweeps mirror the CUDA kernel (earth_mover_distance.cu:3-198):
    pass A row ratios -> fused pass B+C column consumption + transport + cost.

Numerics follow metrics/distance.py exactly (1e-9 regularizers, clamps,
C-int-division multipliers); parity with the XLA path is tested in interpret mode
and measured on TPU (see BASELINE.md).
"""

from __future__ import annotations

import functools

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
               S_ref, K_ref, remainL, remainR, ratioL, x2_ref, y2_ref, acc_n):
        x1 = xyz1_ref[0]  # (n, 3)
        x2_ref[:] = jnp.sum(jnp.square(x1), axis=1, keepdims=True).T  # (1, n)
        remainL[:] = jnp.full((1, n), float(1.0 if n >= m else m // n), jnp.float32)

        # build D once per pair (level-independent); VPU broadcast FMAs beat a
        # K=3 HIGHEST MXU dot here (tiny contraction dim wastes the systolic array)
        for ci in range(n_chunks):  # static unroll
            y_blk = xyz2_ref[0, ci * tm:(ci + 1) * tm, :]
            y2_ref[ci] = jnp.sum(jnp.square(y_blk), axis=1, keepdims=True).T
            remainR[ci] = jnp.full((1, tm), float(n // m if n >= m else 1.0),
                                   jnp.float32)
            xy = x1[:, 0][:, None] * y_blk[:, 0][None, :]
            xy += x1[:, 1][:, None] * y_blk[:, 1][None, :]
            xy += x1[:, 2][:, None] * y_blk[:, 2][None, :]
            d = x2_ref[0, :][:, None] + y2_ref[ci][0][None, :] - 2.0 * xy
            # store sqrt(D): the cost pass needs sqrt every level while exp can use
            # level2*(s*s) for one extra multiply — saves a sqrt per element-level
            S_ref[ci] = jnp.sqrt(jnp.maximum(d, 0.0))

        def level_body(li, cost):
            # level = -4^(7 - li); exp(level*d) computed as exp2(level2*d)
            j = 7.0 - li.astype(jnp.float32)
            level2 = -jnp.exp2(2.0 * j) * _LOG2E

            # pass A: build K for this level (once), accumulate denomL -> ratioL
            def pass_a(ci, _):
                sq = S_ref[ci]
                k = jnp.exp2(level2 * (sq * sq))  # the only exp of the level
                K_ref[ci] = k
                r = remainR[ci]  # (1, tm)
                acc_n[:] = acc_n[:] + jnp.sum(k * r, axis=1)[None, :]
                return 0

            acc_n[:] = jnp.zeros((1, n), jnp.float32)
            jax.lax.fori_loop(0, n_chunks, pass_a, 0)
            ratioL[:] = remainL[:] / (1e-9 + acc_n[:])

            # fused pass B+C per chunk: column consumption, then transport + cost,
            # reusing the K and D tiles resident in VMEM (no recompute)
            acc_n[:] = jnp.zeros((1, n), jnp.float32)

            def pass_bc(ci, cost):
                k = K_ref[ci]  # (n, tm)
                r = remainR[ci]  # (1, tm)
                sumr = jnp.sum(k * ratioL[:].T, axis=0)[None, :] * r  # (1, tm)
                consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
                rr = consumption * r  # ratioR for this chunk, (1, tm)
                remainR[ci] = jnp.maximum(0.0, r - sumr)

                # transport: w = k * ratioL^T rr; never materialized —
                #   cost  += sum(ratioL^T (k . sqrt(D)) rr)   (2-D reduction)
                #   acc_n += row sums of k . rr               (w = that . ratioL)
                krs = k * rr  # broadcast over rows
                cost = cost + jnp.sum((krs * S_ref[ci]) * ratioL[:].T)
                acc_n[:] = acc_n[:] + jnp.sum(krs, axis=1)[None, :]
                return cost

            cost = jax.lax.fori_loop(0, n_chunks, pass_bc, cost)
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

    n_chunks = m // tm
    kernel = _build_kernel(n, m, tm, num_levels=9)

    grid = (B,)
    in_specs = [
        pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    # K resident (n*m*4) + live (n,tm) temporaries; Mosaic's stack accounting is
    # conservative (measured ~114M at 2048^2/tm=512), so grant the full budget
    vmem_bytes = 127 * 2**20

    def call(xyz1, xyz2):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
            scratch_shapes=[
                pltpu.VMEM((n_chunks, n, tm), jnp.float32),  # sqrt(D), chunk-major
                pltpu.VMEM((n_chunks, n, tm), jnp.float32),  # K, chunk-major
                pltpu.VMEM((1, n), jnp.float32),  # remainL
                pltpu.VMEM((n_chunks, 1, tm), jnp.float32),  # remainR, chunk-major
                pltpu.VMEM((1, n), jnp.float32),  # ratioL
                pltpu.VMEM((1, n), jnp.float32),  # x^2
                pltpu.VMEM((n_chunks, 1, tm), jnp.float32),  # y^2, chunk-major
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
