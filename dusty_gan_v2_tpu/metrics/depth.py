"""Masked depth error/accuracy metrics (reference gans/metrics/depth.py:4-45)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_depth_error", "compute_depth_accuracy"]


def compute_depth_error(depth_ref, depth_gen, mask=None):
    mask = jnp.ones_like(depth_ref) if mask is None else mask
    depth_ref = depth_ref + 1e-8
    depth_gen = depth_gen + 1e-8
    denom = jnp.sum(mask, axis=(1, 2, 3))
    abs_rel = jnp.sum(jnp.abs(depth_ref - depth_gen) / depth_ref * mask, (1, 2, 3)) / denom
    sq_rel = jnp.sum((depth_ref - depth_gen) ** 2 / depth_ref * mask, (1, 2, 3)) / denom
    rmse = jnp.sqrt(jnp.sum((depth_ref - depth_gen) ** 2 * mask, (1, 2, 3)) / denom)
    rmse_log = jnp.sqrt(
        jnp.sum((jnp.log(depth_ref) - jnp.log(depth_gen)) ** 2 * mask, (1, 2, 3)) / denom
    )
    return {"abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse, "rmse_log": rmse_log}


def compute_depth_accuracy(depth_ref, depth_gen, mask=None):
    mask = jnp.ones_like(depth_ref) if mask is None else mask
    denom = jnp.sum(mask, axis=(1, 2, 3))
    delta = jnp.maximum(depth_ref / depth_gen, depth_gen / depth_ref)
    out = {}
    for i in (1, 2, 3):
        a = jnp.sum((delta < 1.25**i).astype(jnp.float32) * mask, (1, 2, 3)) / denom
        out[f"accuracy_{i}"] = a
    return out
