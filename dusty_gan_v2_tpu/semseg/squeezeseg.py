"""SqueezeSeg V1/V2 semantic-segmentation networks for range images.

Behavioral equivalents of reference `semseg/models/squeezeseg_v1.py:27-113` and
`squeezeseg_v2.py:20-178`: Fire-module encoder/decoder U-nets with W-only striding,
skip sums, CAM attention (V2), optional CRF-as-RNN refinement.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    ConvReLU,
    ConvReLUNorm,
    DeconvReLU,
    HeadConv,
    TorchConv2d,
    max_pool2d,
    setup_in_ch,
    trunc_normal_init,
    xavier_uniform_init,
)
from .crf_as_rnn import CRFRNN

__all__ = ["SqueezeSegV1", "SqueezeSegV2", "CAM", "FireV1", "FireV2"]


class CAM(nn.Module):
    """Context aggregation module (reference squeezeseg_v2.py:20-36)."""

    ch: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = max_pool2d(x, kernel=7, stride=(1, 1), padding=3)
        a = TorchConv2d(self.ch, self.ch // self.reduction, (1, 1), (1, 1), (0, 0),
                        kernel_init=xavier_uniform_init(), name="fc1")(a)
        a = jax.nn.relu(a)
        a = TorchConv2d(self.ch // self.reduction, self.ch, (1, 1), (1, 1), (0, 0),
                        kernel_init=xavier_uniform_init(), name="fc2")(a)
        return x * jax.nn.sigmoid(a)


class FireV1(nn.Module):
    in_ch: int
    s1x1: int
    e1x1: int
    e3x3: int
    up: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvReLU(self.in_ch, self.s1x1, (1, 1), (1, 1), (0, 0),
                     kernel_init=trunc_normal_init(0.001), name="squeeze1x1")(x)
        if self.up:
            h = DeconvReLU(self.s1x1, self.s1x1, name="upsample")(h)
        a = ConvReLU(self.s1x1, self.e1x1, (1, 1), (1, 1), (0, 0),
                     kernel_init=trunc_normal_init(0.001), name="expand1x1")(h)
        b = ConvReLU(self.s1x1, self.e3x3, (3, 3), (1, 1), (1, 1),
                     kernel_init=trunc_normal_init(0.001), name="expand3x3")(h)
        return jnp.concatenate([a, b], axis=1)


class FireV2(nn.Module):
    in_ch: int
    s1x1: int
    e1x1: int
    e3x3: int
    bn_momentum: float = 0.001
    up: bool = False
    init_std: float = 0.001

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = trunc_normal_init(self.init_std)
        h = ConvReLUNorm(self.in_ch, self.s1x1, (1, 1), (1, 1), (0, 0),
                         self.bn_momentum, kernel_init=init, name="squeeze1x1")(
            x, train=train)
        if self.up:
            h = DeconvReLU(self.s1x1, self.s1x1, name="upsample")(h)
        a = ConvReLUNorm(self.s1x1, self.e1x1, (1, 1), (1, 1), (0, 0),
                         self.bn_momentum, kernel_init=init, name="expand1x1")(
            h, train=train)
        b = ConvReLUNorm(self.s1x1, self.e3x3, (3, 3), (1, 1), (1, 1),
                         self.bn_momentum, kernel_init=init, name="expand3x3")(
            h, train=train)
        return jnp.concatenate([a, b], axis=1)


class SqueezeSegV1(nn.Module):
    inputs: Tuple[str, ...]
    num_classes: int
    head_dropout_p: float = 0.5
    use_crf: bool = False
    crf_kwargs: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, xyz=None, mask=None, train: bool = False):
        img = img.astype(self.dtype)
        in_ch = setup_in_ch(self.inputs)
        init = trunc_normal_init(0.001)
        h_1b = ConvReLU(in_ch, 64, (1, 1), (1, 1), (0, 0), kernel_init=init,
                        name="conv1b")(img)
        h_1a = ConvReLU(in_ch, 64, (3, 3), (1, 2), (1, 1), kernel_init=init,
                        name="conv1a")(img)
        h = max_pool2d(h_1a)
        h = FireV1(64, 16, 64, 64, name="fire2")(h)
        h_3 = FireV1(128, 16, 64, 64, name="fire3")(h)
        h = max_pool2d(h_3)
        h = FireV1(128, 32, 128, 128, name="fire4")(h)
        h_5 = FireV1(256, 32, 128, 128, name="fire5")(h)
        h = max_pool2d(h_5)
        h = FireV1(256, 48, 192, 192, name="fire6")(h)
        h = FireV1(384, 48, 192, 192, name="fire7")(h)
        h = FireV1(384, 64, 256, 256, name="fire8")(h)
        h_9 = FireV1(512, 64, 256, 256, name="fire9")(h)
        h = FireV1(512, 64, 128, 128, up=True, name="fire10")(h_9) + h_5
        h = FireV1(256, 32, 64, 64, up=True, name="fire11")(h) + h_3
        h = FireV1(128, 16, 32, 32, up=True, name="fire12")(h) + h_1a
        h = FireV1(64, 16, 32, 32, up=True, name="fire13")(h) + h_1b
        logit = HeadConv(64, self.num_classes, 3, self.head_dropout_p,
                         kernel_init=init, name="head")(h, train=train)
        logit = logit.astype(jnp.float32)  # CRF/loss in full precision
        if self.use_crf:
            assert xyz is not None and mask is not None
            logit = CRFRNN(num_classes=self.num_classes, **(self.crf_kwargs or {}),
                           name="crf")(logit, xyz, mask)
        return logit


class SqueezeSegV2(nn.Module):
    inputs: Tuple[str, ...]
    num_classes: int
    bn_momentum: float = 0.001
    head_dropout_p: float = 0.5
    use_crf: bool = False
    crf_kwargs: Optional[dict] = None
    logit_bias: Optional[Tuple[float, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, xyz=None, mask=None, train: bool = False):
        # compute-dtype policy: master params stay float32 (every block casts
        # its weights to the activation dtype at trace time), BatchNorm reduces
        # in float32 (common.py), logits return to float32 before CRF/loss
        img = img.astype(self.dtype)
        in_ch = setup_in_ch(self.inputs)
        bm = self.bn_momentum
        h_1b = ConvReLUNorm(in_ch, 64, (1, 1), (1, 1), (0, 0), bm,
                            kernel_init=trunc_normal_init(0.001), name="conv1b")(
            img, train=train)
        h_1a = ConvReLUNorm(in_ch, 64, (3, 3), (1, 2), (1, 1), bm,
                            kernel_init=trunc_normal_init(0.001), name="conv1a")(
            img, train=train)
        h_1a = CAM(64, name="cam1")(h_1a, train=train)

        h = max_pool2d(h_1a)
        h = FireV2(64, 16, 64, 64, bm, name="fire2")(h, train=train)
        h = CAM(128, name="cam2")(h, train=train)
        h = FireV2(128, 16, 64, 64, bm, name="fire3")(h, train=train)
        h_3 = CAM(128, name="cam3")(h, train=train)

        h = max_pool2d(h_3)
        h = FireV2(128, 32, 128, 128, bm, name="fire4")(h, train=train)
        h_5 = FireV2(256, 32, 128, 128, bm, name="fire5")(h, train=train)

        h = max_pool2d(h_5)
        h = FireV2(256, 48, 192, 192, bm, name="fire6")(h, train=train)
        h = FireV2(384, 48, 192, 192, bm, name="fire7")(h, train=train)
        h = FireV2(384, 64, 256, 256, bm, name="fire8")(h, train=train)
        h_9 = FireV2(512, 64, 256, 256, bm, name="fire9")(h, train=train)

        # decoder (trunc-normal std 0.1, reference squeezeseg_v2.py:161)
        h = FireV2(512, 64, 128, 128, bm, up=True, init_std=0.1, name="fire10")(
            h_9, train=train) + h_5
        h = FireV2(256, 32, 64, 64, bm, up=True, init_std=0.1, name="fire11")(
            h, train=train) + h_3
        h = FireV2(128, 16, 32, 32, bm, up=True, init_std=0.1, name="fire12")(
            h, train=train) + h_1a
        h = FireV2(64, 16, 32, 32, bm, up=True, init_std=0.1, name="fire13")(
            h, train=train) + h_1b
        logit = HeadConv(
            64, self.num_classes, 3, self.head_dropout_p,
            kernel_init=trunc_normal_init(0.1),
            bias_init_values=self.logit_bias, name="head",
        )(h, train=train)
        logit = logit.astype(jnp.float32)  # CRF/loss in full precision
        if self.use_crf:
            assert xyz is not None and mask is not None
            logit = CRFRNN(num_classes=self.num_classes, **(self.crf_kwargs or {}),
                           name="crf")(logit, xyz, mask)
        return logit
