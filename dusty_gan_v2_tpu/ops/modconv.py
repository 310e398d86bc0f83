"""Modulated convolution (StyleGAN2) with optional INR-GAN low-rank factorization and
input-variance EMA normalization.

Behavioral equivalent of reference `ops.ModConv2d` (gans/models/ops/style.py:12-133).

TPU-first design: the reference reshapes the batch into conv groups to run a per-sample
weight conv. On TPU the 1x1 case (used by every dusty_v2 conv) is a per-sample matmul —
expressed as an einsum `(B,O,I) x (B,I,H*W)` that XLA tiles directly onto the MXU; the
general-k case uses batched group conv via vmap. Modulation/demodulation are elementwise
chains that XLA fuses into the matmul.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.persample import axis_pmean
from .linear import EqualLRDense

__all__ = ["ModConv2d"]


class ModConv2d(nn.Module):
    in_ch: int
    out_ch: int
    mod_ch: int
    ksize: int = 3
    stride: int = 1
    padding: int = 1
    demod: bool = True
    use_bias: bool = True
    gain: float = 1.0
    transposed: bool = False
    factorization_rank: Optional[int] = None
    ema: bool = False
    ema_decay: float = 0.9989  # 0.5 ** (32 / 20_000)

    @nn.compact
    def __call__(
        self,
        x,
        style,
        train: bool = False,
        x_shared=None,
        shared_rotation=None,
        x_op=None,
        x_stat=None,
        return_weights: bool = False,
    ):
        """Apply the modulated conv.

        x: (B, Cx, H, W) per-sample input, or None when the input is entirely
           `x_shared`.
        x_shared: optional (1, Cs, H, W) batch-shared extra input channels,
           logically concatenated AFTER x's channels (Cx + Cs == in_ch). The
           contraction is split so the shared part runs as ONE (B*O, Cs)x(Cs, HW)
           matmul against the batch-1 tensor — the (B, Cx+Cs, H, W) concat (which
           dominates HBM traffic when Cs is large, see BASELINE.md) is never
           materialized. Only ksize=1/stride=1 supports this path.
        return_weights: return the fully-processed per-sample (B, O, I) 1x1 weights
           and the bias instead of contracting — callers fuse several sibling
           ModConv2d heads into ONE einsum over a stacked weight (Head in
           models/dusty_v2.py). ema stats still update when train=True.
        x_op: optional LINEAR channelwise-independent map (e.g. a FIR resample)
           applied to the x-part contraction result. Since the 1x1 conv acts on
           channels and x_op on space, they commute exactly: x_op(W @ x) ==
           W @ x_op(x) — callers use this to contract at the LOWER resolution
           before upsampling (4x fewer pixels in the matmul). Only the 1x1 path;
           x's spatial dims may differ from x_shared's (x_op must produce
           x_shared's resolution).
        x_stat: optional (sum_sq, count) pair overriding the x-part of the
           ema_var statistic. The statistic is defined on the LOGICAL conv input
           (reference style.py:98-103) — x_op(x), not x — so callers using the
           x_op commute in train mode pass the x_op'd input's statistic computed
           cheaply at the low resolution (ops.resample.resample_sumsq Gram form).
        shared_rotation: optional (sd, cd) pair of (B, n) per-sample coefficients
           with Cs == 2n; the shared channels are treated as [sin-block, cos-block]
           of a Fourier encoding and the *weight columns* are rotated per sample:
           W's = Ws*cd - Wc*sd, W'c = Ws*sd + Wc*cd — exactly equivalent to
           contracting against the per-sample phase-shifted encoding
           [s*cd + c*sd, c*cd - s*sd] (the aug_coords azimuth shift,
           reference dusty_v2.py:264-274) without materializing it. The rotation
           is orthogonal per frequency pair with equal angles, so it commutes
           exactly with demodulation (row norms are preserved).
        """
        if x_shared is None:
            assert x is not None
            B, _, H, W = x.shape
            dtype = x.dtype
        else:
            assert self.ksize == 1 and self.stride == 1 and not self.transposed
            _, Cs, H, W = x_shared.shape
            Cx = 0 if x is None else x.shape[1]
            assert Cx + Cs == self.in_ch, (Cx, Cs, self.in_ch)
            B = style.shape[0]
            dtype = x_shared.dtype
        kh = kw = self.ksize

        weight = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s, jnp.float32),
            (self.out_ch, self.in_ch, kh, kw),
        )

        # modulation MLP (equal-LR linear)
        if self.factorization_rank is None:
            mod_out = self.in_ch
        else:
            mod_out = int((self.in_ch + self.out_ch) * self.factorization_rank)
        style = EqualLRDense(
            in_features=self.mod_ch, features=mod_out, gain=1.0, name="mod"
        )(style)

        scale = 1.0 / math.sqrt(self.in_ch * kh * kw)
        w = (scale * weight).astype(dtype)

        if self.demod:
            # pre-normalize: inf-norm over (O, I, kh) keeping kw — replicates the
            # reference's weight.norm(inf, dim=[1,2,3]) on a (1,O,I,kh,kw) tensor.
            w = w / jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
            style = style / jnp.max(jnp.abs(style), axis=1, keepdims=True)

        if self.factorization_rank is None:
            # StyleGAN2: per-input-channel scale
            s = style.reshape(B, 1, self.in_ch, 1, 1) + 1.0
        else:
            # INR-GAN low-rank factorized modulation
            r = self.factorization_rank
            left = style[:, : self.out_ch * r].reshape(B, self.out_ch, r)
            right = style[:, self.out_ch * r :].reshape(B, r, self.in_ch)
            s = jax.nn.sigmoid(
                jnp.einsum("bor,bri->boi", left, right)
            )[..., None, None]
        wb = w[None] * s  # (B, O, I, kh, kw)

        if self.demod:
            r_norm = lax.rsqrt(jnp.sum(jnp.square(wb), axis=(2, 3, 4), keepdims=True) + 1e-8)
            wb = wb * r_norm

        if self.ema:
            ema_var = self.variable("stats", "ema_var", lambda: jnp.ones((), jnp.float32))
            if train and not self.is_initializing():
                if x_stat is not None:
                    sx, nx = x_stat
                elif x is not None:
                    sx, nx = jnp.sum(jnp.square(x.astype(jnp.float32))), x.size
                else:
                    sx, nx = None, 0
                if x_shared is None:
                    var = sx / nx
                else:
                    # mean of squares over the LOGICAL concat input. A per-sample
                    # phase shift of the [sin, cos] encoding (shared_rotation) is an
                    # isometry per frequency pair, so the shared part's statistic is
                    # exactly the base encoding's — no per-sample terms.
                    ss = jnp.sum(jnp.square(x_shared.astype(jnp.float32)))
                    n_sh = x_shared.size
                    if sx is not None:
                        var = (sx + B * ss / x_shared.shape[0]) / (
                            nx + B * n_sh / x_shared.shape[0]
                        )
                    else:
                        var = ss / n_sh
                # global-batch statistic under data parallelism (equal shard sizes:
                # pmean of per-shard means == the 1-device mean; persample.py). The
                # reference instead broadcasts rank 0's buffer each DDP forward.
                var = axis_pmean(var)
                new = ema_var.value + (1.0 - self.ema_decay) * (
                    jax.lax.stop_gradient(var) - ema_var.value
                )
                ema_var.value = new
            wb = wb / (jnp.sqrt(ema_var.value).astype(dtype) + 1e-8)

        if return_weights:
            assert kh == 1 and kw == 1 and self.stride == 1 and not self.transposed
            b = (
                self.param("bias", nn.initializers.zeros, (self.out_ch,))
                if self.use_bias
                else None
            )
            # the normal path applies gain AFTER bias (h = (x*w + b) * gain), so
            # folding it into both returned tensors is exact for fused callers
            if self.gain != 1.0:
                wb = wb * self.gain
                b = None if b is None else b * self.gain
            return wb[..., 0, 0], b

        if self.transposed:
            assert x_op is None
            wb_t = wb.transpose(0, 2, 1, 3, 4)  # (B, I, O, kh, kw)
            wb_t = jnp.flip(wb_t, axis=(-2, -1)).transpose(0, 2, 1, 3, 4)  # conv form
            p = self.padding
            h = jax.vmap(
                lambda xi, wi: lax.conv_general_dilated(
                    xi[None],
                    wi,
                    window_strides=(1, 1),
                    padding=((kh - 1 - p, kh - 1 - p), (kw - 1 - p, kw - 1 - p)),
                    lhs_dilation=(self.stride, self.stride),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )[0]
            )(x, wb_t)
        elif x_shared is not None:
            w2d = wb[..., 0, 0]  # (B, O, Cx+Cs)
            Cx = 0 if x is None else x.shape[1]
            w_sh = w2d[:, :, Cx:]
            if shared_rotation is not None:
                sd, cd = shared_rotation  # (B, n) each, Cs == 2n
                n = Cs // 2
                ws_, wc_ = w_sh[:, :, :n], w_sh[:, :, n:]
                sd = sd[:, None, :].astype(dtype)
                cd = cd[:, None, :].astype(dtype)
                w_sh = jnp.concatenate(
                    [ws_ * cd - wc_ * sd, ws_ * sd + wc_ * cd], axis=-1
                )
            if x_shared.shape[0] == 1:
                h = (
                    jnp.matmul(
                        w_sh.reshape(B * self.out_ch, Cs),
                        x_shared.reshape(Cs, H * W),
                        preferred_element_type=jnp.float32,
                    )
                    .reshape(B, self.out_ch, H, W)
                    .astype(dtype)
                )
            else:  # per-sample shared input (e.g. per-sample angle grids)
                h = jnp.einsum(
                    "boi,bihw->bohw", w_sh,
                    jnp.broadcast_to(x_shared, (B, Cs, H, W)),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
            if x is not None:
                hx = jnp.einsum(
                    "boi,bihw->bohw", w2d[:, :, :Cx], x,
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                h = h + (x_op(hx) if x_op is not None else hx)
        elif kh == 1 and kw == 1 and self.stride == 1:
            # hot path: per-sample 1x1 modulated conv == batched matmul on the MXU
            h = jnp.einsum(
                "boi,bihw->bohw", wb[..., 0, 0], x, preferred_element_type=jnp.float32
            ).astype(dtype)
            if x_op is not None:
                h = x_op(h)
        else:
            assert x_op is None
            p = self.padding
            h = jax.vmap(
                lambda xi, wi: lax.conv_general_dilated(
                    xi[None],
                    wi,
                    window_strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )[0]
            )(x, wb)

        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            h = h + b.reshape(1, -1, 1, 1).astype(dtype)

        if self.gain != 1.0:
            h = h * self.gain

        return h
