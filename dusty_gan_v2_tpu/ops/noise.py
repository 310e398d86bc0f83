"""Spatial noise injection (StyleGAN2).

Behavioral equivalent of reference `ops.NoiseInjection` (gans/models/ops/style.py:136-160).
The noise is an explicit argument (jax.random key or a fixed (1,1,H,W) map for
inversion-style optimization, mirroring the reference's `fixed_noise` attribute).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.persample import global_ids, ps_normal

__all__ = ["NoiseInjection"]


class NoiseInjection(nn.Module):
    ch: int = 1

    @nn.compact
    def __call__(self, x, rng=None, fixed_noise=None):
        B, C, H, W = x.shape
        weight = self.param("weight", nn.initializers.zeros, (1, self.ch, 1, 1))
        if fixed_noise is not None:
            noise = jnp.broadcast_to(fixed_noise.astype(x.dtype), (B, 1, H, W))
        else:
            assert rng is not None, "NoiseInjection needs an rng or fixed_noise"
            # per-sample keys by global id -> device-count-invariant (persample.py)
            noise = ps_normal(rng, global_ids(B), (1, H, W), x.dtype)
        return x + weight.astype(x.dtype) * noise
