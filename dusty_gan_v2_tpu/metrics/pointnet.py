"""PointNet classifier feature extractor for FPD/KPD.

Behavioral equivalent of reference `gans/metrics/pointnet.py:7-94` (STN3d + 1024-d
max-pool backbone; returns the 1024+512+256+16 concatenated features). Runs in eval
mode with frozen BatchNorm running statistics.

Parameters are kept in a torch-state_dict-shaped pytree so the released SpareNet
checkpoint (`cls_model_39.pth`) converts by pure renaming; `load_torch_state_dict`
performs that conversion when the file is available.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pointnet_features", "init_pointnet_params", "load_torch_state_dict"]

_BN_EPS = 1e-5


def _conv1x1(p, x):  # x (B,C,N)
    w = p["weight"]  # (O, I) or (O, I, 1)
    if w.ndim == 3:
        w = w[..., 0]
    return jnp.einsum("oi,bin->bon", w, x) + p["bias"][None, :, None]


def _dense(p, x):  # x (B, I)
    return x @ p["weight"].T + p["bias"]


def _bn(p, x):
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(p["running_var"].reshape(shape) + _BN_EPS)
    return (x - p["running_mean"].reshape(shape)) * inv * p["weight"].reshape(
        shape
    ) + p["bias"].reshape(shape)


def _stn3d(p, x):  # x (B,3,N) -> (B,3,3)
    h = jax.nn.relu(_bn(p["bn1"], _conv1x1(p["conv1"], x)))
    h = jax.nn.relu(_bn(p["bn2"], _conv1x1(p["conv2"], h)))
    h = jax.nn.relu(_bn(p["bn3"], _conv1x1(p["conv3"], h)))
    h = jnp.max(h, axis=2)  # (B,1024)
    h = jax.nn.relu(_bn(p["bn4"], _dense(p["fc1"], h)))
    h = jax.nn.relu(_bn(p["bn5"], _dense(p["fc2"], h)))
    h = _dense(p["fc3"], h).reshape(-1, 3, 3)
    return h + jnp.eye(3)


def pointnet_features(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, 3, N) point clouds -> (B, 1808) features."""
    feat = params["feat"]
    trans = _stn3d(feat["stn"], x)
    x = jnp.einsum("bcn,bcd->bdn", x, trans)
    h = jax.nn.relu(_bn(feat["bn1"], _conv1x1(feat["conv1"], x)))
    h = jax.nn.relu(_bn(feat["bn2"], _conv1x1(feat["conv2"], h)))
    h = _bn(feat["bn3"], _conv1x1(feat["conv3"], h))
    x1 = jnp.max(h, axis=2)  # (B,1024)
    x2 = jax.nn.relu(_bn(params["bn1"], _dense(params["fc1"], x1)))
    x3 = jax.nn.relu(_bn(params["bn2"], _dense(params["fc2"], x2)))
    x4 = _dense(params["fc3"], x3)
    return jnp.concatenate([x1, x2, x3, x4], axis=1)


def _rand_conv(rng, o, i):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(i)
    return {
        "weight": jax.random.uniform(k1, (o, i), minval=-bound, maxval=bound),
        "bias": jax.random.uniform(k2, (o,), minval=-bound, maxval=bound),
    }


def _rand_bn(c):
    return {
        "weight": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)),
        "running_var": jnp.ones((c,)),
    }


def init_pointnet_params(rng, k: int = 16) -> Dict:
    ks = jax.random.split(rng, 16)
    stn = {
        "conv1": _rand_conv(ks[0], 64, 3),
        "conv2": _rand_conv(ks[1], 128, 64),
        "conv3": _rand_conv(ks[2], 1024, 128),
        "fc1": _rand_conv(ks[3], 512, 1024),
        "fc2": _rand_conv(ks[4], 256, 512),
        "fc3": _rand_conv(ks[5], 9, 256),
        "bn1": _rand_bn(64),
        "bn2": _rand_bn(128),
        "bn3": _rand_bn(1024),
        "bn4": _rand_bn(512),
        "bn5": _rand_bn(256),
    }
    feat = {
        "stn": stn,
        "conv1": _rand_conv(ks[6], 64, 3),
        "conv2": _rand_conv(ks[7], 128, 64),
        "conv3": _rand_conv(ks[8], 1024, 128),
        "bn1": _rand_bn(64),
        "bn2": _rand_bn(128),
        "bn3": _rand_bn(1024),
    }
    return {
        "feat": feat,
        "fc1": _rand_conv(ks[9], 512, 1024),
        "fc2": _rand_conv(ks[10], 256, 512),
        "fc3": _rand_conv(ks[11], k, 256),
        "bn1": _rand_bn(512),
        "bn2": _rand_bn(256),
    }


def load_torch_state_dict(path: str) -> Dict:
    """Convert the released torch checkpoint (cls_model_39.pth) to the params pytree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out: Dict = {}
    for key, val in sd.items():
        if "num_batches_tracked" in key:
            continue
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = np.asarray(val.detach().cpu().numpy())
        if parts[-1] == "weight" and arr.ndim == 3:  # conv1d (O,I,1) -> (O,I)
            arr = arr[..., 0]
        node[parts[-1]] = jnp.asarray(arr)
    return out
