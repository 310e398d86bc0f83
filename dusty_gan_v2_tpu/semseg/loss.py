"""Focal loss + masked reduction (reference semseg/models/loss.py:5-21,
train_semseg.py:192-197).

TPU formulation: the label indexing runs as a one-hot CONTRACTION over the
(small) class axis instead of take_along_axis — a gather's VJP is a
scatter-add, which is the slow path on TPU, while the contraction's VJP is a
dense select (measured: the gather form cost ~30 ms of the 170 ms semseg step
at B=40, scripts/bench_semseg_parts.py). Focal's p_label is recovered as
exp(logp_label) from the SAME log_softmax instead of a second softmax pass —
identical up to one fp rounding (exp(x-lse) either way)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["focal_loss", "cross_entropy", "masked_seg_loss"]


def _label_logp(logit, label):
    """log_softmax(logit)[label] via a one-hot select-sum: (B,C,H,W),(B,H,W)->(B,H,W).
    where() (not multiply) so a -inf logp can never surface as 0*inf=NaN."""
    logp = jax.nn.log_softmax(logit, axis=1)
    onehot = label[:, None] == jnp.arange(logit.shape[1], dtype=label.dtype).reshape(
        1, -1, 1, 1
    )
    return jnp.sum(jnp.where(onehot, logp, 0), axis=1), onehot


def _class_weight(onehot, weight, dtype):
    """weight[label] as the same contraction: (B,C,H,W) bool, (C,) -> (B,H,W)."""
    w = jnp.asarray(weight, dtype).reshape(1, -1, 1, 1)
    return jnp.sum(jnp.where(onehot, w, 0), axis=1)


def cross_entropy(logit, label, class_weight=None):
    """Per-pixel weighted CE: logit (B,C,H,W), label (B,H,W) int."""
    logp_l, onehot = _label_logp(logit, label)
    ce = -logp_l
    if class_weight is not None:
        ce = ce * _class_weight(onehot, class_weight, ce.dtype)
    return ce


def focal_loss(logit, label, gamma: float, alpha=None):
    """(1-p)^gamma weighted CE with optional class weights alpha."""
    logp_l, onehot = _label_logp(logit, label)
    ce = -logp_l
    if alpha is not None:
        ce = ce * _class_weight(onehot, alpha, ce.dtype)
    probs = jnp.exp(logp_l)
    return (1.0 - probs) ** gamma * ce


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
