"""ImageNet-pretrained SqueezeNet v1.1 Fire-weight init for SqueezeSegV2.

Equivalent of reference `semseg/models/squeezeseg_v2.py:136-159`: a joblib pickle
mapping ``"fire{k}/{layer}" -> (weight OIHW, bias)`` (k = 2..9, layer in
squeeze1x1 / expand1x1 / expand3x3) is loaded — from a local path, a cached file,
or (network permitting) the upstream URL — and copied into the encoder Fire conv
params. Our flax modules are flat (``fire2..fire9``) while the reference groups
them in Sequentials (``fire_2_3.1`` etc.); the mapping below is the inverse of the
reference's explicit name remap, so both loads land identical weights.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

__all__ = [
    "SQUEEZENET_V11_URL",
    "FIRE_LAYERS",
    "squeezenet_fire_shapes",
    "load_squeezenet_v11",
    "apply_squeezenet_fire_weights",
]

SQUEEZENET_V11_URL = (
    "https://github.com/xuanyuzhou98/SqueezeSegV2/raw/master/data/SqueezeNet/"
    "squeezenet_v1.1.pkl"
)
# encoder Fire modules that receive pretrained weights (reference :143-152 remap)
FIRE_NAMES = ("fire2", "fire3", "fire4", "fire5", "fire6", "fire7", "fire8", "fire9")
FIRE_LAYERS = ("squeeze1x1", "expand1x1", "expand3x3")

# (in_ch, s1x1, e1x1, e3x3) of each encoder Fire (squeezeseg_v2.py:85-103)
_FIRE_DIMS = {
    "fire2": (64, 16, 64, 64),
    "fire3": (128, 16, 64, 64),
    "fire4": (128, 32, 128, 128),
    "fire5": (256, 32, 128, 128),
    "fire6": (256, 48, 192, 192),
    "fire7": (384, 48, 192, 192),
    "fire8": (384, 64, 256, 256),
    "fire9": (512, 64, 256, 256),
}


def squeezenet_fire_shapes() -> Dict[str, Tuple[Tuple[int, ...], Tuple[int, ...]]]:
    """Expected ``"fire/layer" -> (weight OIHW shape, bias shape)`` of the pickle."""
    shapes = {}
    for fire, (in_ch, s, e1, e3) in _FIRE_DIMS.items():
        shapes[f"{fire}/squeeze1x1"] = ((s, in_ch, 1, 1), (s,))
        shapes[f"{fire}/expand1x1"] = ((e1, s, 1, 1), (e1,))
        shapes[f"{fire}/expand3x3"] = ((e3, s, 3, 3), (e3,))
    return shapes


def _default_cache() -> Path:
    root = Path(__file__).resolve().parents[2]
    return root / "data" / "pretrained" / "squeezenet_v1.1.pkl"


def load_squeezenet_v11(path: Optional[str] = None) -> Dict[str, tuple]:
    """Load the SqueezeNet v1.1 joblib pickle; downloads to the cache if absent
    and the environment has network access.

    Raises FileNotFoundError when no local file exists and download fails —
    callers decide whether pretrained init is mandatory.
    """
    import joblib

    cache = Path(path) if path else _default_cache()
    if not cache.exists():
        if path is not None:
            raise FileNotFoundError(f"pretrained pickle not found: {cache}")
        try:
            from urllib.request import urlretrieve

            cache.parent.mkdir(parents=True, exist_ok=True)
            urlretrieve(SQUEEZENET_V11_URL, str(cache))  # noqa: S310
        except Exception as e:  # zero-egress envs land here
            raise FileNotFoundError(
                f"SqueezeNet v1.1 weights not cached at {cache} and download "
                f"failed ({e}); pass a local path or train from scratch"
            ) from e
    weights = joblib.load(cache)
    _validate(weights)
    return weights


def _validate(weights: Dict[str, tuple]) -> None:
    shapes = squeezenet_fire_shapes()
    for key, (w_shape, b_shape) in shapes.items():
        if key not in weights:
            raise KeyError(f"pretrained pickle missing {key}")
        w, b = weights[key]
        w, b = np.asarray(w), np.asarray(b)
        if tuple(w.shape) != w_shape or tuple(b.shape) != b_shape:
            raise ValueError(
                f"{key}: got weight {w.shape} / bias {b.shape}, "
                f"expected {w_shape} / {b_shape}"
            )


def apply_squeezenet_fire_weights(params, weights: Dict[str, tuple]):
    """Return a params tree with the 8 encoder Fire convs replaced by the
    pretrained (weight, bias) pairs.

    Matches the reference copy loop (squeezeseg_v2.py:141-158): only the conv
    inside each ConvReLUNorm is touched — BN stats/affines keep their init.
    """
    _validate(weights)
    params = dict(params)
    for fire in FIRE_NAMES:
        fire_tree = dict(params[fire])
        for layer in FIRE_LAYERS:
            w, b = weights[f"{fire}/{layer}"]
            layer_tree = dict(fire_tree[layer])
            conv = dict(layer_tree["conv"])
            assert tuple(conv["weight"].shape) == tuple(np.asarray(w).shape), (
                fire, layer, conv["weight"].shape, np.asarray(w).shape)
            conv["weight"] = jnp.asarray(np.asarray(w), jnp.float32)
            conv["bias"] = jnp.asarray(np.asarray(b), jnp.float32)
            layer_tree["conv"] = conv
            fire_tree[layer] = layer_tree
        params[fire] = fire_tree
    return params
