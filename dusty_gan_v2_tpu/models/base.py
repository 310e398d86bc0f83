"""Shared StyleGAN-style generator plumbing: mapping -> (style mixing | repeat) ->
w_avg EMA / truncation trick -> synthesis -> measurement.

Behavioral equivalent of reference `gans/models/base.py:7-143`, expressed functionally:
each arch's linen Generator calls these helpers. All stochastic choices (mixing partner,
crossover point) take explicit jax rngs via linen's make_rng.
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.persample import axis_pmean, global_ids, ps_normal

__all__ = ["GeneratorMixin"]


class GeneratorMixin:
    """Mixin for linen Generator modules.

    Subclasses must define, inside @nn.compact __call__:
      - a mapping fn (z -> w), the synthesis module, the measurement fn
      - self.num_styles / self.style_dim properties
    and then call self._generate(...).
    """

    w_avg_decay: float = 0.995

    def _forward_mapping(
        self,
        mapping_fn: Callable,
        z: jnp.ndarray,
        num_styles: int,
        style_mixing: bool,
    ) -> jnp.ndarray:
        """z (B,D) -> ws (B,N,D), optionally with 2-latent style mixing at a random
        crossover point (reference base.py:65-87)."""
        if style_mixing:
            w1 = mapping_fn(z)
            # device-count invariance (parallel/persample.py): the partner latent is a
            # per-SAMPLE draw keyed by global sample id; the crossover point is a global
            # SCALAR (same on every shard — the stream key is not axis-folded)
            z2 = ps_normal(
                self.make_rng("styles"), global_ids(z.shape[0]), z.shape[1:], z.dtype
            )
            w2 = mapping_fn(z2)
            # crossover n ~ U{1..num_styles}: first n styles from w1, rest from w2
            n = jax.random.randint(self.make_rng("styles"), (), 1, num_styles + 1)
            sel = jnp.arange(num_styles)[None, :, None] < n
            return jnp.where(sel, w1[:, None, :], w2[:, None, :])
        w = mapping_fn(z)
        return jnp.repeat(w[:, None, :], num_styles, axis=1)

    def _style(
        self,
        mapping_fn: Callable,
        z: jnp.ndarray,
        num_styles: int,
        style_dim: int,
        *,
        train: bool,
        style_mixing: bool,
        truncation_psi: float,
        input_w: bool,
    ) -> jnp.ndarray:
        if input_w:
            w = z
        else:
            w = self._forward_mapping(mapping_fn, z, num_styles, style_mixing)
        assert w.ndim == 3, f"styles must be (B,N,D), got {w.shape}"

        w_avg = self.variable(
            "stats", "w_avg", lambda: jnp.zeros((1, style_dim), jnp.float32)
        )
        if train:
            if not self.is_initializing():
                # global-batch mean when a data axis is bound: every shard keeps the
                # SAME w_avg (the reference instead broadcasts rank 0's buffer at each
                # DDP forward, base.py:89-97 + trainer.py:76-79)
                batch_mean = axis_pmean(jnp.mean(
                    jax.lax.stop_gradient(w[:, 0].astype(jnp.float32)),
                    axis=0,
                    keepdims=True,
                ))
                w_avg.value = w_avg.value + (1.0 - self.w_avg_decay) * (
                    batch_mean - w_avg.value
                )
        else:
            if truncation_psi != 1.0:
                w = w_avg.value[None].astype(w.dtype) + truncation_psi * (
                    w - w_avg.value[None].astype(w.dtype)
                )
        return w
