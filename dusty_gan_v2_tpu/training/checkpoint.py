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

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "wait_for_checkpoints",
]


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
    serialized tree is restored into it (correct pytree types). Accepts either the
    single-file msgpack format or an orbax checkpoint directory."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path, state_template)
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    cfg = Config(yaml.safe_load(payload["cfg_yaml"]))
    angle = payload["angle"]
    num_imgs = int(payload["step"])
    state = payload["state"]
    if state_template is not None:
        state = flax.serialization.from_state_dict(state_template, state)
    return cfg, state, angle, num_imgs


# --------------------------------------------------------------------- orbax
# Multi-host-correct checkpointing: every process writes its own shards of the
# (possibly sharded) train state; optional async so the train loop doesn't stall
# on I/O. The msgpack path above stays the default single-host format (and what
# pretrained.autoload_ckpt consumes); an orbax checkpoint is a *directory*.

_ASYNC_CKPTR = None


def _orbax_checkpointer(use_async: bool):
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    if not use_async:
        return ocp.StandardCheckpointer()
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint_orbax(path: str, cfg, state: GANTrainState, angle,
                          num_imgs: int, use_async: bool = True):
    """Write an orbax checkpoint directory: `<path>/state` (sharded pytree, written
    cooperatively by all hosts) + `<path>/meta.msgpack` (cfg/angle/step, chief only)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _orbax_checkpointer(use_async)
    ckptr.save(os.path.join(path, "state"),
               flax.serialization.to_state_dict(state), force=True)

    if jax.process_index() == 0:
        meta = {
            "cfg_yaml": yaml.safe_dump(
                cfg.to_dict() if isinstance(cfg, Config) else cfg
            ),
            "step": np.int64(num_imgs),
            "angle": np.asarray(angle),
        }
        tmp = os.path.join(path, "meta.msgpack.tmp")
        with open(tmp, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(meta))
        os.replace(tmp, os.path.join(path, "meta.msgpack"))


def wait_for_checkpoints():
    """Block until any in-flight async orbax save finishes (call before exit)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint_orbax(path: str, state_template: Optional[GANTrainState] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.msgpack"), "rb") as f:
        meta = flax.serialization.msgpack_restore(f.read())
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "state"))
    cfg = Config(yaml.safe_load(meta["cfg_yaml"]))
    if state_template is not None:
        tree = flax.serialization.from_state_dict(state_template, tree)
    return cfg, tree, meta["angle"], int(meta["step"])
