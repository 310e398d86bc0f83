"""Vanilla (DCGAN-ish) baseline generator/discriminator with ring padding.

Behavioral equivalent of reference `gans/models/vanilla.py:7-105`: equal-LR transposed
convs with reflect/circular padding, fused leaky-ReLU activations, multi-head output, and
a BlurVH + strided-conv discriminator.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    EqualLRConv2d,
    EqualLRConvTranspose2d,
    FusedLeakyReLU,
    blur_vh,
    pad2d,
)
from .base import GeneratorMixin
from .heads import resolve_act

__all__ = ["SynthesisNetwork", "Generator", "Discriminator"]


class Projection(nn.Module):
    """(B,1,C) latent -> (B,ch,H0,W0) via a full-kernel transposed conv."""

    in_ch: int
    out_ch: int
    kernel: Tuple[int, int]

    @nn.compact
    def __call__(self, w):
        x = w.reshape(w.shape[0], -1)[:, :, None, None]  # B 1 C -> B C 1 1
        x = EqualLRConvTranspose2d(
            in_ch=self.in_ch,
            out_ch=self.out_ch,
            kernel_size=self.kernel,
            use_bias=False,
            name="conv",
        )(x)
        return FusedLeakyReLU(self.out_ch, name="act")(x)


class Upsample(nn.Module):
    in_ch: int
    out_ch: int
    ring: bool = True

    @nn.compact
    def __call__(self, x):
        # pad-free circular-W/reflect-H ConvT path when applicable (ops/pad.py)
        if not self.ring:
            x = pad2d(x, 1, ring=self.ring, mode="reflect")
        x = EqualLRConvTranspose2d(
            in_ch=self.in_ch,
            out_ch=self.out_ch,
            kernel_size=(4, 4),
            stride=(2, 2),
            padding=(3, 3),
            use_bias=False,
            ring_fast=self.ring,
            name="conv",
        )(x)
        return FusedLeakyReLU(self.out_ch, name="act")(x)


class Head(nn.Module):
    in_ch: int
    out_ch: Tuple[dict, ...]
    ring: bool = True

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for o in self.out_ch:
            if o["ch"] == 0:
                continue
            h = x if self.ring else pad2d(x, 1, ring=self.ring, mode="reflect")
            h = EqualLRConvTranspose2d(
                in_ch=self.in_ch,
                out_ch=o["ch"],
                kernel_size=(4, 4),
                stride=(2, 2),
                padding=(3, 3),
                use_bias=True,
                ring_fast=self.ring,
                name=o["name"],
            )(h)
            out[o["name"]] = resolve_act(o.get("act"))(h)
        return out


class SynthesisNetwork(nn.Module):
    """Projection + 3x Upsample + Head: 1x1 -> (H/16,W/16) -> ... -> (H,W)."""

    in_ch: int
    out_ch: Tuple[dict, ...]
    ch_base: int = 64
    ch_max: int = 512
    resolution: Tuple[int, int] = (64, 256)
    ring: bool = True

    num_styles: int = 1

    @nn.compact
    def __call__(self, w) -> Dict[str, jnp.ndarray]:
        ch = lambda i: min(self.ch_base << i, self.ch_max)
        res_in = (self.resolution[0] >> 4, self.resolution[1] >> 4)
        h = Projection(self.in_ch, ch(3), res_in, name="projection")(w)
        h = Upsample(ch(3), ch(2), self.ring, name="up1")(h)
        h = Upsample(ch(2), ch(1), self.ring, name="up2")(h)
        h = Upsample(ch(1), ch(0), self.ring, name="up3")(h)
        return Head(ch(0), tuple(self.out_ch), self.ring, name="head")(h)


class Generator(nn.Module, GeneratorMixin):
    """Identity mapping + vanilla synthesis + identity measurement
    (reference vanilla.py:72-82)."""

    synthesis_kwargs: dict
    w_avg_decay: float = 0.995

    @nn.compact
    def __call__(
        self,
        z,
        angle=None,
        *,
        train: bool = False,
        style_mixing: bool = False,
        truncation_psi: float = 1.0,
        input_w: bool = False,
        gumbel_noise=None,
    ):
        synthesis = SynthesisNetwork(**self.synthesis_kwargs, name="synthesis_network")
        w = self._style(
            lambda z: z,
            z,
            synthesis.num_styles,
            self.synthesis_kwargs["in_ch"],
            train=train,
            style_mixing=style_mixing,
            truncation_psi=truncation_psi,
            input_w=input_w,
        )
        o = synthesis(w)
        o["w"] = w
        return o


class Downsample(nn.Module):
    in_ch: int
    out_ch: int
    ring: bool = True

    @nn.compact
    def __call__(self, x):
        # pad-free circular-W/reflect-H path when applicable (ops/pad.py)
        fast = self.ring and x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0
        if not fast:
            x = pad2d(x, 1, ring=self.ring, mode="reflect")
        x = EqualLRConv2d(
            in_ch=self.in_ch,
            out_ch=self.out_ch,
            kernel_size=(4, 4),
            stride=(2, 2),
            use_bias=False,
            ring_fast=fast,
            ring_fast_mode="reflect",
            name="conv",
        )(x)
        return FusedLeakyReLU(self.out_ch, name="act")(x)


class Discriminator(nn.Module):
    """BlurVH + 4 strided downsamples + full-kernel conv to 1 logit
    (reference vanilla.py:94-105)."""

    in_ch: int
    ch_base: int = 64
    ch_max: int = 512
    resolution: Tuple[int, int] = (64, 256)
    ring: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, blur_fuse: bool = True):
        # blur_fuse is accepted for trainer-API uniformity (dusty_v2's D gates
        # its blur->conv composite per phase); the vanilla D has no blur sites.
        ch = lambda i: min(self.ch_base << i, self.ch_max)
        res_out = (self.resolution[0] >> 4, self.resolution[1] >> 4)
        h = blur_vh(x, window=(1, 2, 1), ring=self.ring)
        h = Downsample(self.in_ch * 2, ch(0), self.ring, name="down1")(h)
        h = Downsample(ch(0), ch(1), self.ring, name="down2")(h)
        h = Downsample(ch(1), ch(2), self.ring, name="down3")(h)
        h = Downsample(ch(2), ch(3), self.ring, name="down4")(h)
        h = EqualLRConv2d(
            in_ch=ch(3), out_ch=1, kernel_size=res_out, use_bias=True, name="final"
        )(h)
        return h
