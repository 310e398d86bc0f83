"""DUSty v1: vanilla synthesis + differentiable ray-drop measurement model.

Behavioral equivalent of reference `gans/models/dusty_v1.py:7-42`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import gumbel_sigmoid
from ..ops.gumbel import sample_logistic
from ..parallel.persample import global_ids, per_sample_keys
from . import vanilla
from .base import GeneratorMixin

__all__ = ["apply_raydrop", "Generator"]


def apply_raydrop(
    o: Dict[str, jnp.ndarray],
    rng=None,
    raydrop_const: float = -1.0,
    gumbel_temperature: float = 1.0,
    logistic_noise: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """RayDropModel (reference dusty_v1.py:7-28): sample a hard-but-differentiable drop
    mask from `raydrop_logit` and composite: image = lerp(image, const, 1 - mask)."""
    assert "image" in o and "raydrop_logit" in o
    if logistic_noise is None and rng is not None:
        # per-sample keys by global id -> device-count-invariant draws (persample.py)
        logit = o["raydrop_logit"]
        keys = per_sample_keys(rng, global_ids(logit.shape[0]))
        logistic_noise = jax.vmap(
            lambda k: sample_logistic(k, logit.shape[1:], logit.dtype)
        )(keys)
    mask = gumbel_sigmoid(
        o["raydrop_logit"],
        rng=rng,
        temperature=gumbel_temperature,
        straight_through=True,
        logistic_noise=logistic_noise,
    )
    o = dict(o)
    o["raydrop_mask"] = mask
    o["image_orig"] = o["image"]
    o["image"] = o["image"] * mask + raydrop_const * (1.0 - mask)
    return o


class Generator(nn.Module, GeneratorMixin):
    """vanilla synthesis + RayDropModel measurement (reference dusty_v1.py:31-42)."""

    synthesis_kwargs: dict
    measurement_kwargs: dict
    w_avg_decay: float = 0.995

    @nn.compact
    def __call__(
        self,
        z,
        angle=None,
        *,
        train: bool = False,
        style_mixing: bool = False,
        truncation_psi: float = 1.0,
        input_w: bool = False,
        gumbel_noise=None,
    ):
        synthesis = vanilla.SynthesisNetwork(
            **self.synthesis_kwargs, name="synthesis_network"
        )
        w = self._style(
            lambda z: z,  # identity mapping network
            z,
            synthesis.num_styles,
            self.synthesis_kwargs["in_ch"],
            train=train,
            style_mixing=style_mixing,
            truncation_psi=truncation_psi,
            input_w=input_w,
        )
        o = synthesis(w)
        o["w"] = w
        rng = None
        if gumbel_noise is None:
            rng = self.make_rng("gumbel")
        return apply_raydrop(
            o,
            rng=rng,
            raydrop_const=float(self.measurement_kwargs.get("raydrop_const", -1)),
            gumbel_temperature=float(
                self.measurement_kwargs.get("gumbel_temperature", 1.0)
            ),
            logistic_noise=gumbel_noise,
        )
