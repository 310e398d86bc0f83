"""Pretrained checkpoint registry + autoloader.

Behavioral equivalent of reference `gans/pretrained.py:6-33`: keyword -> WACV'23 release
URL, with local-path fallback. Released `.pth` files are converted on the fly
(convert/torch_weights.py); our native msgpack checkpoints load directly. Either way the
result is a normalized dict {cfg, angle, G/G_ema/D variables}.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .utils.config import Config

_TAG = "weights-wacv23"
_ROOT = f"https://github.com/kazuto1011/dusty-gan-v2/releases/download/{_TAG}/"

PRETRAINED_CKPTS = {
    "dusty_v1": _ROOT + "dustyv1_kitti_64x512_25M.pth",
    "dusty_v2": _ROOT + "dustyv2_kitti_64x512_25M.pth",
    "vanilla": _ROOT + "vanilla_kitti_64x512_25M.pth",
}


def is_available_model(name: str) -> bool:
    return name in PRETRAINED_CKPTS


def _convert_loaded(ckpt: Dict[str, Any]):
    from .convert.torch_weights import (
        convert_discriminator_state,
        convert_generator_state,
    )

    cfg = ckpt["cfg"]
    if hasattr(cfg, "keys") and not isinstance(cfg, dict):
        cfg = dict(cfg)
    arch = cfg["model"]["generator"]["arch"]
    out = {"cfg": Config(cfg), "angle": np.asarray(ckpt["angle"])}
    for key in ("G", "G_ema"):
        if key in ckpt:
            p, s, c = convert_generator_state(ckpt[key], arch)
            out[key] = {"params": p, "stats": s, "consts": c}
    if "D" in ckpt:
        out["D"] = {
            "params": convert_discriminator_state(
                ckpt["D"], cfg["model"]["discriminator"]["arch"]
            )
        }
    return out


def autoload_ckpt(ckpt_name: str) -> Dict[str, Any]:
    """keyword (downloads the released torch weights) or a local path to either a
    released `.pth` or one of our msgpack checkpoints."""
    if is_available_model(ckpt_name):
        import torch.hub

        sd = torch.hub.load_state_dict_from_url(PRETRAINED_CKPTS[ckpt_name], progress=True)
        return _convert_loaded(sd)
    if os.path.exists(ckpt_name):
        if ckpt_name.endswith(".pth"):
            from .convert.torch_weights import load_reference_checkpoint

            ckpt = load_reference_checkpoint(ckpt_name)
            ckpt["cfg"] = Config(ckpt["cfg"])
            return ckpt
        # our native checkpoint
        from .training.checkpoint import load_checkpoint

        cfg, state_dict, angle, num_imgs = load_checkpoint(ckpt_name)
        out = {"cfg": cfg, "angle": angle, "step": num_imgs}
        out["G_ema"] = {
            "params": state_dict["params_G_ema"],
            "stats": state_dict["stats_G_ema"],
            "consts": state_dict["consts_G"],
        }
        out["G"] = {
            "params": state_dict["params_G"],
            "stats": state_dict["stats_G"],
            "consts": state_dict["consts_G"],
        }
        out["D"] = {"params": state_dict["params_D"]}
        out["state"] = state_dict
        return out
    raise ValueError(f"invalid model name or path: {ckpt_name}")
