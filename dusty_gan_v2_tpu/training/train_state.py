"""GAN training state: a single pytree holding both networks, their EMA copy, optimizer
states, the ADA controller, and the PL baseline.

The reference spreads this across DDP module buffers, two torch optimizers, GradScalers
and python attrs (gans/trainer.py:44-202); here it is one replicated pytree that moves
through the jitted train step functionally.
"""

from __future__ import annotations

from typing import Any, Dict

import flax
import jax.numpy as jnp

from ..augment.ada import AdaState


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray  # int32 scalar (iterations completed)
    params_G: Any
    stats_G: Any  # w_avg + modconv ema_var buffers
    consts_G: Any  # frozen fourier banks
    params_D: Any
    params_G_ema: Any
    stats_G_ema: Any
    opt_G: Any
    opt_D: Any
    ada: AdaState
    pl_ema: jnp.ndarray  # scalar


def g_variables(state: GANTrainState) -> Dict[str, Any]:
    return {"params": state.params_G, "stats": state.stats_G, "consts": state.consts_G}


def g_ema_variables(state: GANTrainState) -> Dict[str, Any]:
    return {
        "params": state.params_G_ema,
        "stats": state.stats_G_ema,
        "consts": state.consts_G,
    }


def d_variables(state: GANTrainState) -> Dict[str, Any]:
    return {"params": state.params_D}
