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
    def __call__(self, x, style, train: bool = False):
        B, _, H, W = x.shape
        kh = kw = self.ksize
        dtype = x.dtype

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
                var = jnp.mean(jnp.square(x.astype(jnp.float32)))
                new = ema_var.value + (1.0 - self.ema_decay) * (
                    jax.lax.stop_gradient(var) - ema_var.value
                )
                ema_var.value = new
            wb = wb / (jnp.sqrt(ema_var.value).astype(dtype) + 1e-8)

        if self.transposed:
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
        elif kh == 1 and kw == 1 and self.stride == 1:
            # hot path: per-sample 1x1 modulated conv == batched matmul on the MXU
            h = jnp.einsum(
                "boi,bihw->bohw", wb[..., 0, 0], x, preferred_element_type=jnp.float32
            ).astype(dtype)
        else:
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
