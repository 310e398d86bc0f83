"""Single-file checkpointing for the GAN train state.

Logical payload mirrors the reference checkpoint dict (gans/trainer.py:551-567):
{cfg, step (imgs), angle, G, D, G_ema, ADA state, both optimizers, pl_ema} — here the
whole GANTrainState pytree is serialized with flax msgpack into one file, plus the
config and the angle LUT so checkpoints are self-configuring (test_gan.py loads the
embedded cfg, like the reference).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import numpy as np
import yaml

from ..utils.config import Config
from .train_state import GANTrainState

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, cfg, state: GANTrainState, angle, num_imgs: int):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.device_get(state)
    payload = {
        "cfg_yaml": yaml.safe_dump(cfg.to_dict() if isinstance(cfg, Config) else cfg),
        "step": np.int64(num_imgs),
        "angle": np.asarray(angle),
        "state": flax.serialization.to_state_dict(host_state),
    }
    blob = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template: Optional[GANTrainState] = None):
    """Returns (cfg, state_or_dict, angle, num_imgs). If a template state is given the
    serialized tree is restored into it (correct pytree types)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    cfg = Config(yaml.safe_load(payload["cfg_yaml"]))
    angle = payload["angle"]
    num_imgs = int(payload["step"])
    state = payload["state"]
    if state_template is not None:
        state = flax.serialization.from_state_dict(state_template, state)
    return cfg, state, angle, num_imgs
