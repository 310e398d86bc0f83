"""Pallas TPU kernel: batched greedy furthest-point sampling.

TPU-native equivalent of the reference CUDA FPS
(gans/sampling/fps/furthest_point_sampling.cu:38-100), processing the WHOLE batch
per sequential selection step inside one kernel: coordinates live in VMEM as
(B, N) planes, each of the k-1 steps is a handful of full-width VPU passes
(min-distance update, first-argmax via iota-min, one-hot coordinate extraction),
and only the (k, B) index matrix leaves the chip. The XLA lax.scan formulation
pays per-step gather/argmax/layout overhead on (B, N, 3) tensors; the kernel
removes all HBM traffic from the loop.

Exact-match semantics with metrics/fps.py::furthest_point_sampling: start at
index 0, ties resolve to the lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fps_pallas", "fps_pallas_available"]


def _build_kernel(B: int, N: int, K: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, y_ref, z_ref, idx_ref, dist, px, py, pz):
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

        dist[:] = jnp.full((B, N), 1e10, jnp.float32)
        idx_ref[0, :] = jnp.zeros((B,), jnp.int32)
        px[:] = x_ref[:, 0:1]
        py[:] = y_ref[:, 0:1]
        pz[:] = z_ref[:, 0:1]

        def step(i, _):
            d = (
                jnp.square(x_ref[:] - px[:])
                + jnp.square(y_ref[:] - py[:])
                + jnp.square(z_ref[:] - pz[:])
            )
            nd = jnp.minimum(dist[:], d)
            dist[:] = nd
            m = jnp.max(nd, axis=1, keepdims=True)  # (B,1)
            # first argmax: smallest index among maxima
            j = jnp.min(jnp.where(nd == m, iota, N), axis=1, keepdims=True)  # (B,1)
            idx_ref[pl.ds(i, 1), :] = j.reshape(1, B)
            onehot = (iota == j).astype(jnp.float32)
            px[:] = jnp.sum(x_ref[:] * onehot, axis=1, keepdims=True)
            py[:] = jnp.sum(y_ref[:] * onehot, axis=1, keepdims=True)
            pz[:] = jnp.sum(z_ref[:] * onehot, axis=1, keepdims=True)
            return 0

        jax.lax.fori_loop(1, K, step, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(B: int, N: int, K: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _build_kernel(B, N, K)

    def call(x, y, z):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, B), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((B, N), jnp.float32),  # running min distances
                pltpu.VMEM((B, 1), jnp.float32),  # last selected x
                pltpu.VMEM((B, 1), jnp.float32),  # last selected y
                pltpu.VMEM((B, 1), jnp.float32),  # last selected z
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(110 * 2**20, (5 * B * N + K * B) * 4
                                         + (8 << 20)))
            ),
            interpret=interpret,
        )(x, y, z)

    return call


def fps_pallas_available(B: int, N: int, k: int) -> bool:
    # VMEM budget: 4 (B,N) f32 planes + (k,B) indices
    return N >= 128 and (5 * B * N + k * B) * 4 < 100 * 2**20


def fps_pallas(xyz: jnp.ndarray, k: int, interpret: bool = False) -> jnp.ndarray:
    """(B,N,3) -> (B,k) int32 indices; same semantics as furthest_point_sampling."""
    B, N, _ = xyz.shape
    x = xyz[:, :, 0]
    y = xyz[:, :, 1]
    z = xyz[:, :, 2]
    call = _build_call(B, N, int(k), interpret)
    idx = call(x.astype(jnp.float32), y.astype(jnp.float32), z.astype(jnp.float32))
    return jax.lax.stop_gradient(idx.T)
