"""Equalized learning-rate layers (ProgressiveGAN / StyleGAN2).

Behavioral equivalent of the reference `ops.EqualLR` wrapper
(gans/models/ops/common.py:158-210): weights are initialized N(0, 1/lr_mul) and scaled at
runtime by `1/sqrt(fan_in) * gain * lr_mul`; biases are initialized to zero and scaled by
`gain * lr_mul`.

Parameters are stored in the torch layout ((out,in) for dense, (O,I,kh,kw) for conv,
(I,O,kh,kw) for transposed conv) so that released-checkpoint conversion is a pure rename.
The matmuls/convs map directly onto the TPU MXU via jnp.einsum / lax.conv_general_dilated.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .pad import conv_ring_fast, convT4x4s2_ring_fast, pad2d

__all__ = ["EqualLRDense", "EqualLRConv2d", "EqualLRConvTranspose2d", "RingConv2d"]


def _normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class EqualLRDense(nn.Module):
    """Equal-LR linear layer: y = (x @ (W * scale).T + b) * gain * lr_mul."""

    in_features: int
    features: int
    use_bias: bool = True
    gain: float = 1.0
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", _normal_init(1.0 / self.lr_mul), (self.features, self.in_features)
        )
        scale = 1.0 / math.sqrt(self.in_features)
        gain_ = self.gain * self.lr_mul
        y = jnp.einsum(
            "...i,oi->...o", x, (w * scale).astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(x.dtype)
        return y * gain_


class EqualLRConv2d(nn.Module):
    """Equal-LR Conv2d (zero padding handled by the caller), NCHW.

    fan_in = in_ch * kh * kw (matches torch Conv2d weight[0].numel()).
    """

    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    gain: float = 1.0
    lr_mul: float = 1.0
    # pad-free circular-W 3x3/4x4 path (ops/pad.py::conv_ring_fast);
    # input arrives UNPADDED when set
    ring_fast: bool = False
    ring_fast_mode: str = "replicate"  # H pad mode of the fast path
    # fold a preceding FIR blur into this conv (ops/blurconv.py); input arrives
    # UNPADDED and UNBLURRED when set — the module computes conv(blur(x))
    blur_window: Tuple[float, ...] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        w = self.param(
            "weight", _normal_init(1.0 / self.lr_mul), (self.out_ch, self.in_ch, kh, kw)
        )
        scale = 1.0 / math.sqrt(self.in_ch * kh * kw)
        gain_ = self.gain * self.lr_mul
        if self.blur_window is not None:
            from .blurconv import blur_conv1x1s2_ring, blur_conv3x3s2_ring

            fused = blur_conv3x3s2_ring if kh == 3 else blur_conv1x1s2_ring
            y = fused(x, w * scale, self.blur_window)
        elif self.ring_fast:
            y = conv_ring_fast(
                x, (w * scale).astype(x.dtype), self.stride, self.ring_fast_mode
            )
        else:
            y = lax.conv_general_dilated(
                x,
                (w * scale).astype(x.dtype),
                window_strides=self.stride,
                padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.reshape(1, -1, 1, 1).astype(x.dtype)
        return y * gain_


class EqualLRConvTranspose2d(nn.Module):
    """Equal-LR ConvTranspose2d, NCHW, torch semantics (stride, padding).

    NOTE: the reference computes fan_in from `weight[0].numel()` of a torch
    ConvTranspose2d whose weight layout is (in, out, kh, kw) — i.e. fan_in is
    out_ch * kh * kw (reference common.py:172-173). We replicate that exactly.
    """

    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    gain: float = 1.0
    lr_mul: float = 1.0
    # pad-free path for the ConvT(pad2d(x,1), k=4, s=2, p=3) composite
    # (ops/pad.py::convT4x4s2_ring_fast); input arrives UNPADDED when set
    ring_fast: bool = False
    ring_fast_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        w = self.param(
            "weight", _normal_init(1.0 / self.lr_mul), (self.in_ch, self.out_ch, kh, kw)
        )
        scale = 1.0 / math.sqrt(self.out_ch * kh * kw)
        gain_ = self.gain * self.lr_mul
        # conv_transpose(x, W) == conv(dilate(x, s), flip(W).T, pad = k-1-p)
        w_t = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)
        ph, pw = self.padding
        sh, sw = self.stride
        if self.ring_fast:
            assert (kh, kw) == (4, 4) and (sh, sw) == (2, 2) and (ph, pw) == (3, 3)
            y = convT4x4s2_ring_fast(
                x, (w_t * scale).astype(x.dtype), self.ring_fast_mode
            )
        else:
            y = lax.conv_general_dilated(
                x,
                (w_t * scale).astype(x.dtype),
                window_strides=(1, 1),
                padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
                lhs_dilation=(sh, sw),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.reshape(1, -1, 1, 1).astype(x.dtype)
        return y * gain_


class RingConv2d(nn.Module):
    """Pad(ring/replicate or reflect) + Conv2d (+ optional equal LR).

    Equivalent of the reference `ops.Conv2d` composite (common.py:187-210).
    """

    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    ring: bool = False
    pad_mode: str = "replicate"
    equal_lr: bool = True
    gain: float = 1.0
    lr_mul: float = 1.0
    # fold a preceding FIR blur into the conv (ops/blurconv.py); caller passes
    # the UNBLURRED input
    blur_window: Tuple[float, ...] = None

    @nn.compact
    def __call__(self, x):
        # pad-free fast path for the hot case (dusty_v2 D): 3x3, pad 1, circular-W /
        # replicate-H, stride 1 or 2 — the boundary corrections replace the full
        # padded-copy materialization (29% of D fwd+bwd, scripts/bench_ringpad.py)
        fast = (
            self.kernel_size in (3, 4)
            and self.padding == 1
            and self.ring
            and self.pad_mode in ("replicate", "reflect")
            and self.stride in (1, 2)
            and not (self.kernel_size == 4 and self.stride == 1)
            and (self.stride == 1 or (x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0))
        )
        if self.blur_window is not None:
            from .blurconv import blur_conv_fusable

            assert blur_conv_fusable(
                x.shape, self.kernel_size, self.stride, self.padding,
                self.ring, self.pad_mode,
            ), "blur_window set on a non-fusable conv site"
            fast = False
        if not fast and self.blur_window is None and self.padding != 0:
            x = pad2d(x, self.padding, ring=self.ring, mode=self.pad_mode)
        assert self.equal_lr, "non-equal-LR conv not used by any reference model"
        return EqualLRConv2d(
            in_ch=self.in_ch,
            out_ch=self.out_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            stride=(self.stride, self.stride),
            use_bias=self.use_bias,
            gain=self.gain,
            lr_mul=self.lr_mul,
            ring_fast=fast,
            ring_fast_mode=self.pad_mode,
            blur_window=self.blur_window,
            name="conv",
        )(x)
