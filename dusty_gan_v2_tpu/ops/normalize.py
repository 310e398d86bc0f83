"""Pixel normalization and minibatch standard deviation.

Equivalents of reference `ops.PixelNorm` / `ops.MinibatchStdDev`
(gans/models/ops/common.py:213-253).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixel_norm", "minibatch_stddev"]


def pixel_norm(x: jnp.ndarray, axis: int = 1, alpha: float = 1e-8) -> jnp.ndarray:
    """x / sqrt(mean(x^2) + alpha) over `axis` (channel dim)."""
    y = jnp.sqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + alpha)
    return x / y


def minibatch_stddev(
    x: jnp.ndarray, group: int = 4, features: int = 1, alpha: float = 1e-8
) -> jnp.ndarray:
    """Append per-group stddev statistics as extra channels (NCHW).

    Matches the reference exactly, including its batch grouping convention: the batch is
    reshaped to (group, B//group, ...) so group members are strided B//group apart.
    """
    B, C, H, W = x.shape
    g = min(B, group)
    y = x.reshape(g, B // g, features, C // features, H, W)
    y = jnp.sqrt(jnp.var(y, axis=0) + alpha)  # biased variance, like torch unbiased=False
    y = jnp.mean(y, axis=(2, 3, 4), keepdims=True)  # (B//g, F, 1, 1, 1)
    y = y[:, :, 0]  # (B//g, F, 1, 1)
    y = jnp.tile(y, (g, 1, H, W))  # (B, F, H, W)
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)
