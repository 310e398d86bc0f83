"""Furthest point sampling (TPU-native equivalent of the reference CUDA FPS kernels,
gans/sampling/fps/furthest_point_sampling.cu:38-100).

The iterative selection is a lax.scan of k steps; each step is a fused elementwise
min-update + argmax over N — VPU-friendly, no data-dependent shapes. Like the
reference, sampling is non-differentiable (indices) and starts from index 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sampling", "gather_points", "downsample_point_clouds"]


def furthest_point_sampling(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B,N,3) -> (B,k) int32 indices maximizing minimum pairwise distance."""
    B, N, _ = xyz.shape

    def step(carry, _):
        min_d, last = carry
        p = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum(jnp.square(xyz - p), axis=-1)  # (B,N)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        return (min_d, nxt), nxt

    first = jnp.zeros((B,), jnp.int32)
    init = (jnp.full((B, N), 1e10, jnp.float32), first)
    (_, _), rest = jax.lax.scan(step, init, None, length=k - 1)
    idx = jnp.concatenate([first[None], rest], axis=0)  # (k, B)
    return jax.lax.stop_gradient(idx.T)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B,N,C), (B,k) -> (B,k,C)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def downsample_point_clouds(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """FPS-downsample (B,N,3) -> (B,k,3) (reference furthest_point_sampling.py:85-94).

    On TPU, dispatches to the batched Pallas kernel (pallas_fps.py) when its VMEM
    budget fits: the whole (B,N) min-distance state stays resident across the k
    selection steps, measured 6.8x over the lax.scan (0.56 vs 3.81 ms/cloud at
    B=64, N=32768, k=2048 on v5e — scripts/bench_fps.py). Index parity with the
    scan is exact up to floating-point ties (equidistant points may be picked in
    either order; the selected index *set* is identical).
    """
    B, N, _ = xyz.shape
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if on_tpu:
        from .pallas_fps import fps_pallas, fps_pallas_available

        if fps_pallas_available(B, N, k):
            return gather_points(xyz, fps_pallas(xyz, k))
    return gather_points(xyz, furthest_point_sampling(xyz, k))
