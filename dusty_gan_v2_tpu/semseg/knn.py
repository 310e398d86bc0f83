"""kNN2d label refinement on depth images (RangeNet++-style post-filter).

Behavioral equivalent of reference `semseg/models/knn.py:19-76`: inverse-Gaussian
weighted depth jumps within a window, top-k neighbor label vote with distance cutoff.
Pure function (no parameters).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .common import unfold_neighbors

__all__ = ["knn2d"]


def _inv_gaussian_kernel(kernel_size, sigma):
    H, W = kernel_size
    hs = np.arange(H) - H // 2
    ws = np.arange(W) - W // 2
    pdist = (hs[:, None] ** 2 + ws[None, :] ** 2).astype(np.float32)
    k = np.exp(-pdist / (2 * sigma**2))
    k /= k.sum()
    return jnp.asarray(1.0 - k)


def knn2d(
    depth: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    k: int = 3,
    kernel_size: Tuple[int, int] = (3, 3),
    sigma: float = 1.0,
    cutoff: float = 1.0,
) -> jnp.ndarray:
    """depth (B,1,H,W), label (B,H,W) int -> refined label (B,H,W)."""
    B, C, H, W = depth.shape
    ks = kernel_size
    pad = (ks[0] // 2, ks[1] // 2)
    HW = H * W

    # neighbor depths INCLUDING center (torch unfold keeps all taps)
    nb = unfold_neighbors(depth, ks, exclude_center=False)  # (B,1,K,HW)
    nb = jnp.where(nb < 0, jnp.inf, nb)
    jump = jnp.abs(nb - depth.reshape(B, 1, 1, HW))  # (B,1,K,HW)

    # penalize far pixels: depthwise conv of each jump plane with the inverse gaussian
    K = ks[0] * ks[1]
    jump_img = jump.reshape(B, K, H, W)
    kern = jnp.broadcast_to(_inv_gaussian_kernel(ks, sigma)[None, None], (K, 1, *ks))
    dist = lax.conv_general_dilated(
        jump_img, kern, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=K,
    ).reshape(B, 1, K, HW)

    # k nearest neighbors by penalized distance
    neg_top, idx_top = lax.top_k(-dist.transpose(0, 1, 3, 2), k)  # over K axis
    dist_top = -neg_top  # (B,1,HW,k)

    lab_nb = unfold_neighbors(
        label[:, None].astype(jnp.float32), ks, exclude_center=False
    )  # (B,1,K,HW)
    lab_nb = lab_nb.transpose(0, 1, 3, 2)  # (B,1,HW,K)
    lab_top = jnp.take_along_axis(lab_nb, idx_top, axis=-1).astype(jnp.int32)

    if cutoff > 0:
        lab_top = jnp.where(dist_top > cutoff, num_classes, lab_top)

    # majority vote over classes (overflow bin excluded)
    onehot = jax.nn.one_hot(lab_top, num_classes + 1, axis=-1)  # (B,1,HW,k,C+1)
    votes = jnp.sum(onehot, axis=3)[..., :num_classes]  # (B,1,HW,C)
    refined = jnp.argmax(votes, axis=-1)
    return refined.reshape(B, H, W)
