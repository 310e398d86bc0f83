"""Output-head activation resolution shared by the model zoo.

The reference configs name torch modules ("nn.Tanh"); we accept those strings plus plain
names for convenience (reference vanilla.py:36-38, dusty_v2.py:242-249).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["resolve_act"]

_ACTS = {
    None: lambda x: x,
    "none": lambda x: x,
    "identity": lambda x: x,
    "nn.Identity": lambda x: x,
    "tanh": jnp.tanh,
    "nn.Tanh": jnp.tanh,
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "nn.Sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
}


def resolve_act(name):
    if callable(name):
        return name
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(f"unknown head activation: {name!r}")
