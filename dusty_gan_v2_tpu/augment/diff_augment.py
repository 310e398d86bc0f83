"""DiffAugment (Zhao et al. 2020): simpler differentiable augmentation alternative with
the same adaptive-p protocol as ADA.

Behavioral equivalent of reference `gans/augment/diff_augment.py:16-160` (flip /
brightness / contrast / translation-with-horizontal-circulation / cutout). Like the
reference, it is NOT wired into the default trainer — available via config.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .ada import AdaState

__all__ = ["DiffAugment"]


def _per_sample_select(rng, p, aug, orig):
    B = orig.shape[0]
    keep = jax.random.bernoulli(rng, p, (B,) + (1,) * (orig.ndim - 1))
    return jnp.where(keep, aug, orig)


def rand_brightness(x, rng, p, band=0.2):
    k1, k2 = jax.random.split(rng)
    factor = jax.random.normal(k1, (x.shape[0], 1, 1, 1)) * band
    return _per_sample_select(k2, p, x + factor, x)


def rand_contrast(x, rng, p, band=0.5):
    k1, k2 = jax.random.split(rng)
    factor = jnp.exp2(jax.random.normal(k1, (x.shape[0], 1, 1, 1)) * band)
    return _per_sample_select(k2, p, x * factor, x)


def random_flip(x, rng, p):
    return _per_sample_select(rng, p * 0.5, jnp.flip(x, axis=3), x)


def rand_translation(x, rng, p, ratio=(1 / 8, 1 / 8)):
    B, C, H, W = x.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    sh = int(H * ratio[0] / 2 + 0.5)
    sw = int(W * ratio[1] / 2 + 0.5)
    th = jax.random.randint(k1, (B, 1, 1), -sh, sh + 1)
    tw = jax.random.randint(k2, (B, 1, 1), -sw, sw + 1)
    gh = jnp.arange(H)[None, :, None]
    gw = jnp.arange(W)[None, None, :]
    # vertical: zero-pad boundary (reference pads one row top/bottom then clamps)
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    idx_h = jnp.clip(gh + th + 1, 0, H + 1)  # (B,H,1)
    idx_w = (gw + tw) % (W - 1)  # horizontal circulation (reference :72)
    bidx = jnp.arange(B)[:, None, None]
    y = x_pad[bidx, :, idx_h, idx_w]  # (B,H,W,C)
    y = y.transpose(0, 3, 1, 2)
    return _per_sample_select(k3, p, y, x)


def rand_cutout(x, rng, p, ratio=0.5):
    B, C, H, W = x.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    ch = int(H * ratio + 0.5)
    cw = int(W * ratio + 0.5)
    oh = jax.random.randint(k1, (B, 1, 1), 0, H + (1 - ch % 2))
    ow = jax.random.randint(k2, (B, 1, 1), 0, W + (1 - cw % 2))
    gh = jnp.arange(H)[None, :, None]
    gw = jnp.arange(W)[None, None, :]
    # inside-cut mask computed directly (equivalent to the reference scatter)
    in_h = (gh >= jnp.clip(oh - ch // 2, 0, H)) & (gh < jnp.clip(oh - ch // 2 + ch, 0, H))
    in_w = (gw >= jnp.clip(ow - cw // 2, 0, W)) & (gw < jnp.clip(ow - cw // 2 + cw, 0, W))
    mask = 1.0 - (in_h & in_w).astype(x.dtype)
    y = x * mask[:, None]
    return _per_sample_select(k3, p, y, x)


_FNS = {
    "flip": random_flip,
    "brightness": rand_brightness,
    "contrast": rand_contrast,
    "translation": rand_translation,
    "cutout": rand_cutout,
}


class DiffAugment:
    """Same interface as AdaptiveAugment: __call__(x, p, rng) + pure-p controller."""

    def __init__(self, policy: Sequence[str] | None = None, p_init=0.0,
                 p_target=0.6, kimg=500):
        self.policy = list(policy) if policy is not None else [
            "flip", "brightness", "contrast", "translation", "cutout",
        ]
        if p_target is None:
            p_init = 1.0
        self.p_init = float(p_init)
        self.p_target = p_target
        self.kimg = float(kimg) * 1000.0

    def init_state(self) -> AdaState:
        return AdaState.create(self.p_init)

    def __call__(self, x, p, rng):
        for i, name in enumerate(self.policy):
            x = _FNS[name](x, jax.random.fold_in(rng, i), p)
        return x

    @staticmethod
    def cumulate(state: AdaState, y_real, axis_name=None) -> AdaState:
        from .ada import AdaptiveAugment

        return AdaptiveAugment.cumulate(state, y_real, axis_name)

    def update_p(self, state: AdaState):
        rt = state.sign_cum / jnp.maximum(state.n_pred_cum, 1.0)
        if self.p_target is not None:
            adjust = jnp.sign(rt - self.p_target) * state.n_pred_cum / self.kimg
            p = jnp.clip(state.p + adjust, 0.0, 1.0)
        else:
            p = state.p
        z = jnp.zeros((), jnp.float32)
        return AdaState(p=p, sign_cum=z, n_pred_cum=z), rt
