"""Jensen-Shannon divergence between occupancy-grid marginals of point-cloud sets.

Behavioral equivalent of reference `gans/metrics/jsd.py:10-116`: 28^3 unit-cube grid
clipped to the unit sphere, nearest-cell voting, JSD between the two count
distributions. The reference's triple-nested batching becomes a chunked argmin over the
(points, grid) distance matrix — one MXU matmul per chunk.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .distance import pairwise_sqdist

__all__ = ["compute_jsd", "entropy_of_occupancy_grid", "unit_cube_grid_point_cloud"]


def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool):
    spacing = 1.0 / (resolution - 1)
    steps = np.arange(resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(steps, steps, steps, indexing="ij"), axis=-1)
    grid = grid * spacing - 0.5
    grid = grid.reshape(-1, 3)
    if clip_sphere:
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


def entropy_of_occupancy_grid(pcs, resolution=28, in_sphere=True, batch_size=128):
    """pcs: (B, Np, 3) in the unit sphere -> (entropy, per-cell vote counts)."""
    pcs = np.asarray(pcs)
    eps = 1e-3
    if np.abs(pcs).max() > 0.5 + eps:
        warnings.warn("Point-clouds are not in unit cube.")
    if in_sphere and np.linalg.norm(pcs, axis=2).max() > 0.5 + eps:
        warnings.warn("Point-clouds are not in unit sphere.")

    grid, _ = unit_cube_grid_point_cloud(resolution, in_sphere)
    Ng = len(grid)
    grid_j = jnp.asarray(grid)

    @jax.jit
    def nearest_cell(batch):  # (b, Np, 3) -> (b, Np)
        d = pairwise_sqdist(batch, jnp.broadcast_to(grid_j[None], (batch.shape[0], Ng, 3)))
        return jnp.argmin(d, axis=2)

    B = pcs.shape[0]
    inds = []
    for i in range(0, B, batch_size):
        inds.append(np.asarray(nearest_cell(jnp.asarray(pcs[i : i + batch_size]))))
    inds = np.concatenate(inds, axis=0)  # (B, Np)

    counters = np.bincount(inds.ravel(), minlength=Ng).astype(np.float64)
    occupied = np.zeros(Ng, np.float64)
    for row in inds:
        occupied[np.unique(row)] += 1.0

    p = occupied[occupied > 0] / float(B)
    acc_entropy = float(_entropy_nat(np.concatenate([p, 1 - p])) / Ng)
    return acc_entropy, counters


def _entropy_nat(p, eps=1e-8):
    p = p + eps
    return float(np.sum(-p * np.log(p)))


def _entropy2(p, eps=1e-8):
    p = p + eps
    return float(np.sum(-p * np.log2(p)))


def jensen_shannon_divergence(P, Q):
    assert (P >= 0).all() and (Q >= 0).all()
    P_ = P / P.sum()
    Q_ = Q / Q.sum()
    return _entropy2((P_ + Q_) / 2.0) - (_entropy2(P_) + _entropy2(Q_)) / 2.0


def compute_jsd(pcs_gen, pcs_ref, resolution=28, batch_size=128) -> float:
    _, gen_counts = entropy_of_occupancy_grid(pcs_gen, resolution, True, batch_size)
    _, ref_counts = entropy_of_occupancy_grid(pcs_ref, resolution, True, batch_size)
    return float(jensen_shannon_divergence(gen_counts, ref_counts))
