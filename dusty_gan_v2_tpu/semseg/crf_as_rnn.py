"""CRF-as-RNN refinement layer (mean-field approximation).

Behavioral equivalent of reference `semseg/models/crf_as_rnn.py:8-132`: fixed Gaussian
smoothness kernels per class, data-dependent appearance kernel from xyz neighbor
distances, trainable per-class kernel weights + Potts label-compatibility 1x1 conv,
`num_iters` message-passing rounds.

TPU notes: unfold is static shifted slicing; the reference's per-sample python loop
(memory-motivated, :94-103) becomes lax.map over the batch.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .common import unfold_neighbors

__all__ = ["CRFRNN"]


def _smoothness_kernel(kernel_size, thetas, num_classes):
    H, W = kernel_size
    assert H % 2 == 1 and W % 2 == 1
    hs = np.arange(H) - H // 2
    ws = np.arange(W) - W // 2
    pdist = (hs[:, None] ** 2 + ws[None, :] ** 2).astype(np.float32)
    kernel = np.zeros((num_classes, num_classes, H, W), np.float32)
    for c in range(num_classes):
        k = np.exp(-pdist / (2 * thetas[c] ** 2))
        k[H // 2, W // 2] = 0.0
        kernel[c, c] = k
    return jnp.asarray(kernel)


class CRFRNN(nn.Module):
    num_classes: int
    kernel_size: Tuple[int, int] = (3, 5)
    init_weight_smoothness: float = 0.02
    init_weight_appearance: float = 0.1
    # scalar or per-class sequence (the shipped configs use per-class lists)
    theta_gamma: Union[float, Sequence[float]] = 0.9
    theta_alpha: Union[float, Sequence[float]] = 0.9
    theta_beta: Union[float, Sequence[float]] = 0.015
    num_iters: int = 3

    def _per_class(self, v):
        if isinstance(v, (int, float)):
            return [float(v)] * self.num_classes
        assert len(v) == self.num_classes
        return [float(x) for x in v]

    @nn.compact
    def __call__(self, unary, xyz, mask, train: bool = False):
        C = self.num_classes
        ks = tuple(self.kernel_size)
        pad = (ks[0] // 2, ks[1] // 2)
        thetas_g = self._per_class(self.theta_gamma)
        thetas_a = self._per_class(self.theta_alpha)
        thetas_b = np.asarray(self._per_class(self.theta_beta), np.float32)
        kernel_gamma = _smoothness_kernel(ks, thetas_g, C)
        kernel_alpha = _smoothness_kernel(ks, thetas_a, C)

        w_app = self.param(
            "weight_appearance",
            lambda k, s: jnp.full(s, self.init_weight_appearance),
            (1, C, 1, 1),
        )
        w_smo = self.param(
            "weight_smoothness",
            lambda k, s: jnp.full(s, self.init_weight_smoothness),
            (1, C, 1, 1),
        )
        compat = self.param(
            "label_compatibility",
            lambda k, s: (1.0 - jnp.eye(C))[..., None, None],
            (C, C, 1, 1),
        )

        B, _, H, W = unary.shape
        if mask.ndim == 3:
            mask = mask[:, None]

        # appearance kernel from xyz neighbor distances (stop-gradient, :118)
        xyz_anchor = xyz.reshape(B, 3, 1, H * W)
        xyz_nb = unfold_neighbors(xyz, ks)  # (B,3,K-1,HW)
        pdist = jnp.sum((xyz_nb - xyz_anchor) ** 2, axis=1, keepdims=True)
        beta = jnp.asarray(thetas_b)[None, :, None, None]  # (1,C,1,1)
        kernel_beta = jax.lax.stop_gradient(
            jnp.exp(-pdist / (2 * beta**2))
        )  # (B,C,K-1,HW) per-class when beta varies

        def smooth(Q, kern):
            return lax.conv_general_dilated(
                Q, kern, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        def appearance(Q):
            masked_Q = Q * mask

            def one(args):
                q_i, kb_i = args  # (C,H,W), (1,K-1,HW)
                q_nb = unfold_neighbors(q_i[None], ks)[0]  # (C,K-1,HW)
                return jnp.sum(q_nb * kb_i, axis=1)  # (C,HW)

            exp_app = lax.map(one, (masked_Q, kernel_beta))
            exp_app = exp_app.reshape(B, C, H, W) * mask
            exp_smo = smooth(Q, kernel_alpha)
            return exp_app * exp_smo

        Q = unary
        for _ in range(self.num_iters):
            Q = jax.nn.softmax(Q, axis=1)
            k_s = smooth(Q, kernel_gamma)
            k_a = appearance(Q)
            weighted = w_smo * k_s + w_app * k_a
            pairwise = lax.conv_general_dilated(
                weighted, compat, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            Q = unary - pairwise
        return Q
