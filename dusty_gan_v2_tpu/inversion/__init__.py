"""GAN-inversion toolkit: spherical optimization, multiscale masked losses, geodesic
w+ regularization, two-stage (latent -> pivotal tuning) optimization.

Behavioral equivalents of reference `gans/inversion.py:10-97` and the optimization
loop structure of `demo_inversion.py:95-268`. Everything is a pure function; the
optimization steps are jit-compiled.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pad import pad2d

__all__ = [
    "masked_loss",
    "multiscale_masked_loss",
    "geocross_loss",
    "spherical_project",
    "normalize_noise",
    "stylegan2_lr_schedule",
]

_BLUR3 = (np.outer([1, 2, 1], [1, 2, 1]) / 16.0).astype(np.float32)


def masked_loss(img_ref, img_gen, mask, distance: str = "l1", relative: bool = True):
    """Per-sample masked (optionally reference-relative) L1/L2
    (reference inversion.py:23-29)."""
    if distance == "l1":
        loss = jnp.abs(img_ref - img_gen)
    elif distance == "l2":
        loss = (img_ref - img_gen) ** 2
    else:
        raise NotImplementedError(distance)
    if relative:
        loss = (loss * mask) / (img_ref + 1e-11)
    loss = jnp.sum(loss * mask, axis=(1, 2, 3))
    return loss / (jnp.sum(mask, axis=(1, 2, 3)) + 1e-8)


def _blurpool(x):
    C = x.shape[1]
    h = pad2d(x, 1, ring=True, mode="replicate")
    k = jnp.broadcast_to(jnp.asarray(_BLUR3)[None, None], (C, 1, 3, 3))
    return lax.conv_general_dilated(
        h, k.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def _update_mask(mask):
    h = pad2d(mask, 1, ring=True, mode="replicate")
    ones = jnp.ones((1, 1, 3, 3), mask.dtype)
    count = lax.conv_general_dilated(
        h, ones, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    norm = 9.0 / jnp.where(count == 0, 1.0, count)
    new_mask = (count > 0).astype(mask.dtype)
    return norm, new_mask


def multiscale_masked_loss(
    gen, ref, mask, level: Optional[int] = None, distance: str = "l1",
    relative: bool = True,
):
    """Masked blur-pool pyramid loss with mask renormalization
    (reference inversion.py:32-78)."""
    H = gen.shape[2]
    level = int(np.log2(H)) if level is None else level
    loss = 0.0
    for _ in range(max(1, level)):
        loss = loss + masked_loss(ref, gen, mask, distance, relative)
        norm, new_mask = _update_mask(mask)
        gen = _blurpool(gen * mask) * norm
        ref = _blurpool(ref * mask) * norm
        mask = new_mask
    return loss


def geocross_loss(latents):
    """PULSE geodesic-cross regularizer on w+ codes (reference inversion.py:81-90)."""
    B, N, D = latents.shape
    X = latents.reshape(B, 1, N, D)
    Y = latents.reshape(B, N, 1, D)
    A = jnp.sqrt(jnp.sum((X - Y) ** 2, axis=-1) + 1e-9)
    Bm = jnp.sqrt(jnp.sum((X + Y) ** 2, axis=-1) + 1e-9)
    Dm = 2.0 * jnp.arctan2(A, Bm)
    return jnp.mean(Dm**2 * Dm, axis=(1, 2)) / 8.0


def spherical_project(param):
    """Re-project onto the hypersphere after an Adam step: x /= rms(x) over the last dim
    (reference SphericalOptimizer, inversion.py:10-20)."""
    return param / jnp.sqrt(jnp.mean(param**2, axis=-1, keepdims=True) + 1e-9)


def normalize_noise(noises):
    """Zero-mean/unit-std renormalization of optimized noise maps
    (reference inversion.py:93-97)."""
    return jax.tree_util.tree_map(
        lambda n: (n - jnp.mean(n)) / (jnp.std(n) + 1e-12), noises
    )


def stylegan2_lr_schedule(num_steps: int, rampup_ratio: float = 0.05,
                          rampdown_ratio: float = 0.25) -> Callable[[int], float]:
    """Cosine ramp-down + linear ramp-up multiplier (demo_inversion.py:144-149)."""

    def fn(iteration):
        t = iteration / num_steps
        gamma = min(1.0, (1.0 - t) / rampdown_ratio)
        gamma = 0.5 - 0.5 * math.cos(gamma * math.pi)
        return gamma * min(1.0, t / rampup_ratio)

    return fn
