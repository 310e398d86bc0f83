"""Gumbel-sigmoid (binary relaxed-Bernoulli) sampling with straight-through estimator.

Behavioral equivalent of reference `ops.GumbelSigmoid` (gans/models/ops/gumbel.py:5-32):
the differentiable LiDAR ray-drop sampler.

Stochasticity is explicit: pass a `jax.random` key, or pass `logistic_noise` directly to
pin the sample (replaces the reference's "fixed noise forward hook" eval trick,
test_gan.py:96-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gumbel_sigmoid", "sample_logistic"]


def sample_logistic(rng, shape, dtype=jnp.float32, eps=1e-7):
    """Logistic(0,1) noise: log(u) - log(1-u), u ~ U(0,1)."""
    u = jax.random.uniform(rng, shape, dtype, minval=eps, maxval=1.0 - eps)
    return jnp.log(u) - jnp.log1p(-u)


def gumbel_sigmoid(
    logits: jnp.ndarray,
    rng=None,
    temperature: float = 1.0,
    straight_through: bool = True,
    logistic_noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """RelaxedBernoulli(temperature, logits).rsample() with optional straight-through.

    The relaxed sample is sigmoid((logits + L) / temperature), L ~ Logistic(0,1).
    Straight-through: hard threshold at 0.5 in the forward pass, soft gradient.
    """
    if logistic_noise is None:
        assert rng is not None, "gumbel_sigmoid needs an rng or explicit noise"
        logistic_noise = sample_logistic(rng, logits.shape, logits.dtype)
    soft = jax.nn.sigmoid((logits + logistic_noise) / temperature)
    if straight_through:
        hard = (soft > 0.5).astype(logits.dtype)
        return soft + jax.lax.stop_gradient(hard - soft)
    return soft
