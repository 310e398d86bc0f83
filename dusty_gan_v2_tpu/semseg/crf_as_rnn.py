"""CRF-as-RNN refinement layer (mean-field approximation).

Behavioral equivalent of reference `semseg/models/crf_as_rnn.py:8-132`: fixed Gaussian
smoothness kernels per class, data-dependent appearance kernel from xyz neighbor
distances, trainable per-class kernel weights + Potts label-compatibility 1x1 conv,
`num_iters` message-passing rounds.

TPU notes: the layer is conv-free and unfold-free. The reference's unfold +
per-sample python loop (memory-motivated, :94-103) and its per-class diagonal
convs both map poorly to TPU (odd-K stacked tensors defeat fusion; convs with
C=num_classes contracting dims pay the 128-lane tile tax). Here every term is a
chain of statically shifted (B,C,H,W) slices with scalar or precomputed-plane
multipliers, fully vectorized over the batch, which XLA fuses into a handful of
elementwise kernels in the step graph (measured 218->227 ms/step for the whole
SqueezeSegV2 train step with the CRF on, vs +340 ms for the unfold form).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["CRFRNN"]


def _smoothness_taps(kernel_size, thetas):
    """Per-class scalar tap weights of the diagonal Gaussian smoothness kernel.

    The reference materializes a (C,C,kh,kw) conv kernel whose only nonzero
    entries are the per-class diagonal (`semseg/models/crf_as_rnn.py:36-47`).
    On TPU that conv is a bad fit (contracting dim C=num_classes, typically 3-5,
    padded to the 128-lane tile); since the kernel is diagonal it is exactly a
    sum of shifted copies of Q scaled by per-(offset,class) scalars — returned
    here as a (K-1, C) float32 array (center tap excluded: it is zeroed, :46).
    """
    H, W = kernel_size
    assert H % 2 == 1 and W % 2 == 1
    hs = np.arange(H) - H // 2
    ws = np.arange(W) - W // 2
    pdist = (hs[:, None] ** 2 + ws[None, :] ** 2).astype(np.float32)
    taps = np.exp(
        -pdist[None] / (2 * np.asarray(thetas, np.float32)[:, None, None] ** 2)
    )  # (C, kh, kw)
    taps = taps.reshape(len(thetas), -1).T  # (K, C)
    center = (H // 2) * W + (W // 2)
    return np.delete(taps, center, axis=0)  # (K-1, C)


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
        taps_gamma = jnp.asarray(_smoothness_taps(ks, thetas_g))  # (K-1, C)
        taps_alpha = jnp.asarray(_smoothness_taps(ks, thetas_a))

        # NB: explicit dtype — jnp.full with a python-float fill yields a
        # weak_type leaf, and a weak-typed param makes training step 2 a jit
        # cache MISS (outputs come back strong-typed): one full silent recompile
        # of the train graph, ~5-60 s on a remote device.
        w_app = self.param(
            "weight_appearance",
            lambda k, s: jnp.full(s, self.init_weight_appearance, jnp.float32),
            (1, C, 1, 1),
        )
        w_smo = self.param(
            "weight_smoothness",
            lambda k, s: jnp.full(s, self.init_weight_smoothness, jnp.float32),
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

        # appearance kernel from xyz neighbor distances (stop-gradient, :118).
        # TPU formulation: instead of the reference's unfold into a stacked
        # (B,C,K-1,HW) neighbor tensor (whose odd-K layout defeats XLA's fusion in
        # the full training graph — measured +340 ms/step), keep everything in
        # plain (B,C,H,W) planes: one zero-padded copy of xyz, and per neighbor
        # offset a fused shift->sqdist->exp->multiply-accumulate chain.
        ph, pw = pad
        xyz_p = jnp.pad(xyz, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        beta2 = jnp.asarray(2.0 * thetas_b**2)[None, :, None, None]  # (1,C,1,1)
        offsets = [
            (dy, dx)
            for dy in range(ks[0])
            for dx in range(ks[1])
            if not (dy == ph and dx == pw)
        ]
        kernel_beta = [
            jax.lax.stop_gradient(
                jnp.exp(
                    -jnp.sum(
                        (xyz_p[:, :, dy : dy + H, dx : dx + W] - xyz) ** 2,
                        axis=1, keepdims=True,
                    )
                    / beta2
                )
            )  # (B,C,H,W) per-class when beta varies
            for dy, dx in offsets
        ]

        # The whole mean-field iteration is conv-free: the reference's per-class
        # diagonal smoothness convs (:60-75) become 14 shift-scale-accumulates
        # (scalar tap per offset per class), and the 1x1 label-compatibility conv
        # (:84) becomes a tiny CxC einsum. All tensors stay (B,C,H,W) elementwise
        # chains — no conv ops, so XLA never imposes a lane-padded feature layout
        # (C=3..5 padded to 128) or layout transposes inside the unrolled loop.
        # Vectorized over the batch: the reference loops per-sample to bound GPU
        # memory (:94-103); any serial loop starves the TPU (a lax.map over B
        # measured 2.8 s/step).
        def shifted(x_p, off):
            dy, dx = off
            return x_p[:, :, dy : dy + H, dx : dx + W]

        Q = unary
        for _ in range(self.num_iters):
            Q = jax.nn.softmax(Q, axis=1)
            masked_Q = Q * mask
            Q_p = jnp.pad(Q, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
            mq_p = jnp.pad(masked_Q, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
            k_s = jnp.zeros_like(Q)
            exp_smo = jnp.zeros_like(Q)
            exp_app = jnp.zeros_like(Q)
            for i, off in enumerate(offsets):
                q_sh = shifted(Q_p, off)
                k_s = k_s + q_sh * taps_gamma[i][None, :, None, None]
                exp_smo = exp_smo + q_sh * taps_alpha[i][None, :, None, None]
                exp_app = exp_app + shifted(mq_p, off) * kernel_beta[i]
            k_a = (exp_app * mask) * exp_smo
            weighted = w_smo * k_s + w_app * k_a
            pairwise = jnp.einsum("ij,bjhw->bihw", compat[:, :, 0, 0], weighted)
            Q = unary - pairwise
        return Q
