"""Focal loss + masked reduction (reference semseg/models/loss.py:5-21,
train_semseg.py:192-197)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["focal_loss", "cross_entropy", "masked_seg_loss"]


def cross_entropy(logit, label, class_weight=None):
    """Per-pixel weighted CE: logit (B,C,H,W), label (B,H,W) int."""
    logp = jax.nn.log_softmax(logit, axis=1)
    ce = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight)[label]
        ce = ce * w
    return ce


def focal_loss(logit, label, gamma: float, alpha=None):
    """(1-p)^gamma weighted CE with optional class weights alpha."""
    xent = cross_entropy(logit, label, alpha)
    probs = jnp.take_along_axis(jax.nn.softmax(logit, axis=1), label[:, None], axis=1)[
        :, 0
    ]
    return (1.0 - probs) ** gamma * xent


def masked_seg_loss(per_pixel_loss, mask):
    """sum(loss*mask)/sum(mask) (train_semseg.py masked_loss).

    Under a bound data axis the denominator is the MEAN of the per-shard mask sums:
    then pmean(per-shard losses) == the global masked mean and pmean(grads) == the
    global gradient, i.e. the step is device-count invariant. (The reference's DDP
    instead averages per-GPU masked means with unequal valid-pixel counts — a subtle
    batch-placement dependence this formulation removes; 1-device semantics are
    identical since pmean is then the identity.)"""
    from ..parallel.persample import axis_pmean

    return jnp.sum(per_pixel_loss * mask) / axis_pmean(jnp.sum(mask))
