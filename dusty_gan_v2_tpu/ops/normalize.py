"""Pixel normalization and minibatch standard deviation.

Equivalents of reference `ops.PixelNorm` / `ops.MinibatchStdDev`
(gans/models/ops/common.py:213-253).
"""

from __future__ import annotations

import jax
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

    Under a bound data axis (inside the shard_map train step) the statistic is computed
    over the GLOBAL batch — group size stays `group`, the strided partition is taken
    over the all-gathered batch, and each shard slices back its rows. This makes the
    feature identical to a single-device run on the same global batch (device-count
    invariance; the reference's per-GPU grouping is batch-placement dependent).
    """
    from ..parallel.persample import DATA_AXIS, axis_bound

    B, C, H, W = x.shape
    if axis_bound(DATA_AXIS):
        xg = jax.lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)
        yg = _stddev_feature(xg, group, features, alpha)  # (Bg, F, 1, 1)
        start = jax.lax.axis_index(DATA_AXIS) * B
        y = jax.lax.dynamic_slice_in_dim(yg, start, B, axis=0)
    else:
        y = _stddev_feature(x, group, features, alpha)
    y = jnp.tile(y, (1, 1, H, W))
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)


def _stddev_feature(x, group, features, alpha):
    """Per-sample (B, F, 1, 1) stddev feature, reference grouping convention."""
    B, C, H, W = x.shape
    g = min(B, group)
    y = x.reshape(g, B // g, features, C // features, H, W)
    y = jnp.sqrt(jnp.var(y, axis=0) + alpha)  # biased variance, like torch unbiased=False
    y = jnp.mean(y, axis=(2, 3, 4), keepdims=True)  # (B//g, F, 1, 1, 1)
    y = y[:, :, 0]  # (B//g, F, 1, 1)
    return jnp.tile(y, (g, 1, 1, 1))  # (B, F, 1, 1)
