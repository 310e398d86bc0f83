"""Point-cloud distances: Chamfer, approximate Earth Mover's Distance, density-aware CD.

TPU-native equivalents of the reference CUDA kernels:
  * chamfer_distance  <- gans/metrics/distance/cd/chamfer_distance.cu (bidirectional
    nearest neighbors). Here the (N,M) squared-distance matrix is one |x|^2+|y|^2-2xy
    matmul on the MXU + row/col min.
  * earth_mover_distance <- gans/metrics/distance/emd/earth_mover_distance.cu
    approxmatch: 9 annealing levels (-4^j, j=7..-1) of soft-assignment updates; each
    level is a handful of (N,M) matmuls/elementwise ops — ideal MXU work, no scalar
    loops. The match construction and cost (sum match * euclidean distance) follow the
    kernel exactly (integer-division multipliers included).
  * density_aware_chamfer_distance <- gans/metrics/distance/dcd.py:31-65.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pairwise_sqdist",
    "chamfer_distance",
    "approx_match",
    "match_cost",
    "earth_mover_distance",
    "density_aware_chamfer_distance",
    "fscore",
]


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B,N,3) x (B,M,3) -> (B,N,M) squared euclidean distances (MXU matmul form).

    NOTE: uses HIGHEST matmul precision — the TPU's default bf16 dot would give ~1e-2
    absolute error on O(1) coordinates, which corrupts metrics and (worse) yields
    slightly negative squared distances that explode inside EMD's exp(-4^7 * d).
    Results are clamped to >= 0.
    """
    x2 = jnp.sum(jnp.square(x), axis=-1)  # (B,N)
    y2 = jnp.sum(jnp.square(y), axis=-1)  # (B,M)
    xy = jnp.einsum(
        "bnd,bmd->bnm", x, y,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(x2[:, :, None] + y2[:, None, :] - 2.0 * xy, 0.0)


def chamfer_distance(
    x: jnp.ndarray, y: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional NN squared distances + indices: (dist1, dist2, idx1, idx2).

    dist1[b,i] = min_j |x_i - y_j|^2 (like the reference: squared distances).
    """
    D = pairwise_sqdist(x, y)
    dist1 = jnp.min(D, axis=2)
    idx1 = jnp.argmin(D, axis=2).astype(jnp.int32)
    dist2 = jnp.min(D, axis=1)
    idx2 = jnp.argmin(D, axis=1).astype(jnp.int32)
    return dist1, dist2, idx1, idx2


def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Approximate bipartite matching (B,N,3)x(B,M,3) -> match (B,M,N).

    Faithful matrix form of approxmatchkernel (earth_mover_distance.cu:3-198):
    annealed soft assignment over levels -4^7 .. -4^-1 with supply/demand bookkeeping.
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    # note: C integer division, as in the kernel
    if n >= m:
        multiL, multiR = 1.0, float(n // m)
    else:
        multiL, multiR = float(m // n), 1.0

    D = pairwise_sqdist(xyz1, xyz2)  # (B,n,m)

    match = jnp.zeros((B, n, m), jnp.float32)
    remainL = jnp.full((B, n), multiL, jnp.float32)
    remainR = jnp.full((B, m), multiR, jnp.float32)

    levels = [-(4.0**j) for j in range(7, -2, -1)]  # j = 7..-1

    def level_step(carry, level):
        match, remainL, remainR = carry
        K = jnp.exp(level * D)  # (B,n,m)
        # 1) left ratios against current right supply
        denomL = 1e-9 + jnp.einsum("bnm,bm->bn", K, remainR)
        ratioL = remainL / denomL
        # 2) right consumption
        sumr = jnp.einsum("bnm,bn->bm", K, ratioL) * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        # 3) transported mass
        w = K * ratioL[:, :, None] * ratioR[:, None, :]
        match = match + w
        remainL = jnp.maximum(0.0, remainL - jnp.sum(w, axis=2))
        return (match, remainL, remainR), None

    (match, _, _), _ = jax.lax.scan(
        level_step, (match, remainL, remainR), jnp.asarray(levels)
    )
    return match.transpose(0, 2, 1)  # (B, M, N) like the kernel layout


def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray, match: jnp.ndarray) -> jnp.ndarray:
    """sum over (l,k) of match[l,k] * |xyz1_k - xyz2_l| (matchcostkernel :200-244)."""
    D = jnp.sqrt(jnp.maximum(pairwise_sqdist(xyz1, xyz2), 0.0))  # (B,n,m)
    return jnp.sum(match.transpose(0, 2, 1) * D, axis=(1, 2))


def earth_mover_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Per-batch approximate EMD cost (NOT divided by N; callers divide, as in
    reference cov_mmd_1nna.py:16-23).

    Fused form: the cost sum(match * |x-y|) accumulates inside the annealing scan, so
    the (B,N,M) match tensor never round-trips HBM (the metric path needs no grads
    through the match). Numerically identical to match_cost(approx_match(...)).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        multiL, multiR = 1.0, float(n // m)
    else:
        multiL, multiR = float(m // n), 1.0

    D = pairwise_sqdist(xyz1, xyz2)
    sqrtD = jnp.sqrt(D)
    remainL = jnp.full((B, n), multiL, jnp.float32)
    remainR = jnp.full((B, m), multiR, jnp.float32)
    cost = jnp.zeros((B,), jnp.float32)

    levels = [-(4.0**j) for j in range(7, -2, -1)]

    def level_step(carry, level):
        cost, remainL, remainR = carry
        K = jnp.exp(level * D)
        denomL = 1e-9 + jnp.einsum("bnm,bm->bn", K, remainR)
        ratioL = remainL / denomL
        sumr = jnp.einsum("bnm,bn->bm", K, ratioL) * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        w = K * ratioL[:, :, None] * ratioR[:, None, :]
        cost = cost + jnp.sum(w * sqrtD, axis=(1, 2))
        remainL = jnp.maximum(0.0, remainL - jnp.sum(w, axis=2))
        return (cost, remainL, remainR), None

    (cost, _, _), _ = jax.lax.scan(
        level_step, (cost, remainL, remainR), jnp.asarray(levels)
    )
    return cost


def fscore(dist1, dist2, threshold=1e-4):
    p1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    p2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    f = 2 * p1 * p2 / (p1 + p2)
    return jnp.nan_to_num(f, nan=0.0), p1, p2


def density_aware_chamfer_distance(
    x: jnp.ndarray, gt: jnp.ndarray, alpha: float = 1000.0, n_lambda: float = 1.0,
    non_reg: bool = False,
):
    """DCD (reference dcd.py:31-65). Returns (loss, cd_p, cd_t)."""
    B, n_x, _ = x.shape
    n_gt = gt.shape[1]
    if non_reg:
        frac_12 = max(1.0, n_x / n_gt)
        frac_21 = max(1.0, n_gt / n_x)
    else:
        frac_12 = n_x / n_gt
        frac_21 = n_gt / n_x

    # calc_cd convention: cham_loss(gt, output) -> dist1 over gt, dist2 over x
    dist1, dist2, idx1, idx2 = chamfer_distance(gt, x)
    cd_p = (jnp.sqrt(dist1).mean(1) + jnp.sqrt(dist2).mean(1)) / 2
    cd_t = dist1.mean(1) + dist2.mean(1)

    exp_d1 = jnp.exp(-dist1 * alpha)
    exp_d2 = jnp.exp(-dist2 * alpha)

    def counts(idx, size):
        return jax.vmap(lambda i: jnp.bincount(i, length=size))(idx)

    count1 = counts(idx1, n_x)  # how often each x point is someone's NN
    weight1 = jnp.take_along_axis(count1, idx1, axis=1).astype(jnp.float32) ** n_lambda
    weight1 = 1.0 / (weight1 + 1e-6) * frac_21
    loss1 = jnp.mean(1 - exp_d1 * jax.lax.stop_gradient(weight1), axis=1)

    count2 = counts(idx2, n_gt)
    weight2 = jnp.take_along_axis(count2, idx2, axis=1).astype(jnp.float32) ** n_lambda
    weight2 = 1.0 / (weight2 + 1e-6) * frac_12
    loss2 = jnp.mean(1 - exp_d2 * jax.lax.stop_gradient(weight2), axis=1)

    return (loss1 + loss2) / 2, cd_p, cd_t
