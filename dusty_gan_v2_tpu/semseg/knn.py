"""kNN2d label refinement on depth images (RangeNet++-style post-filter).

Behavioral equivalent of reference `semseg/models/knn.py:19-76`: inverse-Gaussian
weighted depth jumps within a window, top-k neighbor label vote with distance cutoff.
Pure function (no parameters).

TPU notes: conv-free and unfold-free (same formulation as the CRF-as-RNN head,
crf_as_rnn.py). The reference materializes a (B,K,H,W) jump stack and runs a
K-grouped depthwise conv with the inverse-Gaussian kernel (`knn.py:50-53`); here
each jump plane is a fused shift->abs chain over one padded depth copy, and the
penalty conv is K shift-scale-accumulates per plane (the kernel taps are scalars),
so everything stays (B,1,H,W) elementwise work XLA fuses — no grouped-conv or
lane-padded small-C layouts. Only the final top-k/gather/vote works on a (K,...)
stack, as in the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["knn2d"]


def _inv_gaussian_kernel(kernel_size, sigma):
    H, W = kernel_size
    hs = np.arange(H) - H // 2
    ws = np.arange(W) - W // 2
    pdist = (hs[:, None] ** 2 + ws[None, :] ** 2).astype(np.float32)
    k = np.exp(-pdist / (2 * sigma**2))
    k /= k.sum()
    return 1.0 - k  # (kh, kw) numpy


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
    ph, pw = ks[0] // 2, ks[1] // 2
    HW = H * W
    taps = _inv_gaussian_kernel(ks, sigma)  # (kh,kw) scalar taps
    offsets = [(dy, dx) for dy in range(ks[0]) for dx in range(ks[1])]

    def shifted(x_p, off):
        dy, dx = off
        return x_p[:, :, dy : dy + H, dx : dx + W]

    # per-tap depth jump planes: |nb - center| with nb<0 -> inf (zero padding
    # stays finite, matching torch F.unfold's zero pad, reference knn.py:44-47)
    depth_p = jnp.pad(depth, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    jumps = []
    for off in offsets:
        nb = shifted(depth_p, off)
        nb = jnp.where(nb < 0, jnp.inf, nb)
        jumps.append(jnp.abs(nb - depth))  # (B,1,H,W)

    # penalize far pixels: correlate each jump plane with the inverse-Gaussian
    # kernel (reference's K-grouped depthwise conv, knn.py:50-53) as K scalar
    # shift-scale-accumulates; tap order matches conv reduction order
    dists = []
    for jump in jumps:
        jp = jnp.pad(jump, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        acc = jnp.zeros_like(jump)
        for (dy, dx) in offsets:
            acc = acc + float(taps[dy, dx]) * shifted(jp, (dy, dx))
        dists.append(acc)
    dist = jnp.stack(dists, axis=2).reshape(B, 1, ks[0] * ks[1], HW)

    # k nearest neighbors by penalized distance
    neg_top, idx_top = jax.lax.top_k(-dist.transpose(0, 1, 3, 2), k)  # over K axis
    dist_top = -neg_top  # (B,1,HW,k)

    label_p = jnp.pad(label[:, None], ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    lab_nb = jnp.stack(
        [shifted(label_p, off) for off in offsets], axis=2
    ).reshape(B, 1, ks[0] * ks[1], HW)
    lab_nb = lab_nb.transpose(0, 1, 3, 2)  # (B,1,HW,K)
    lab_top = jnp.take_along_axis(lab_nb, idx_top, axis=-1).astype(jnp.int32)

    if cutoff > 0:
        lab_top = jnp.where(dist_top > cutoff, num_classes, lab_top)

    # majority vote over classes (overflow bin excluded)
    onehot = jax.nn.one_hot(lab_top, num_classes + 1, axis=-1)  # (B,1,HW,k,C+1)
    votes = jnp.sum(onehot, axis=3)[..., :num_classes]  # (B,1,HW,C)
    refined = jnp.argmax(votes, axis=-1)
    return refined.reshape(B, H, W)
