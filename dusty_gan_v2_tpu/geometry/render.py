"""Differentiable point-cloud -> image rendering (BEV views for logging).

Behavioral equivalent of reference `gans/render.py:6-127` without kornia: a pinhole
projection (z-division) plus a bilinear scatter-add rasterizer. The scatter uses
jnp `.at[].add` segment sums, which XLA lowers to efficient TPU scatters.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["make_Rt", "render_point_clouds", "bilinear_rasterizer"]


def _axis_angle_rotation(axis: int, angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    if axis == 0:  # roll, x
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    if axis == 1:  # pitch, y
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)  # yaw, z


def make_Rt(roll=0.0, pitch=0.0, yaw=0.0, x=0.0, y=0.0, z=0.0):
    """Extrinsics: yaw -> pitch -> roll composition (reference render.py:6-18)."""
    R = (
        _axis_angle_rotation(2, yaw)
        @ _axis_angle_rotation(1, pitch)
        @ _axis_angle_rotation(0, roll)
    )
    t = np.array([[x, y, z]], np.float32)
    return jnp.asarray(R[None]), jnp.asarray(t)


def bilinear_rasterizer(
    coords: jnp.ndarray, values: jnp.ndarray, out_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Scatter-add values (B,N,C) at fractional 2D coords (B,N,2) -> (B,C,H,W).

    Matches the reference splatting (render.py:70-127): 4-corner bilinear weights,
    border-clamped with zeroed out-of-range contributions, tiny weights (<1e-3) dropped.
    """
    B, N, C = values.shape
    H, W = out_shape
    h = coords[..., 0]
    w = coords[..., 1]

    h_t = jnp.floor(h)
    h_b = h_t + 1
    w_l = jnp.floor(w)
    w_r = w_l + 1

    h_t_safe = jnp.clip(h_t, 0.0, H - 1)
    h_b_safe = jnp.clip(h_b, 0.0, H - 1)
    w_l_safe = jnp.clip(w_l, 0.0, W - 1)
    w_r_safe = jnp.clip(w_r, 0.0, W - 1)

    wt_h_t = (h_b - h) * (h_t == h_t_safe)
    wt_h_b = (h - h_t) * (h_b == h_b_safe)
    wt_w_l = (w_r - w) * (w_l == w_l_safe)
    wt_w_r = (w - w_l) * (w_r == w_r_safe)

    out = jnp.zeros((B, H * W, C), values.dtype)
    batch_idx = jnp.arange(B)[:, None]
    for wt, hh, ww in (
        (wt_h_t * wt_w_l, h_t_safe, w_l_safe),
        (wt_h_t * wt_w_r, h_t_safe, w_r_safe),
        (wt_h_b * wt_w_l, h_b_safe, w_l_safe),
        (wt_h_b * wt_w_r, h_b_safe, w_r_safe),
    ):
        wt = wt * (wt >= 1e-3)
        idx = (ww + W * hh).astype(jnp.int32)  # (B,N)
        out = out.at[batch_idx, idx].add(values * wt[..., None])
    return out.reshape(B, H, W, C).transpose(0, 3, 1, 2)


def render_point_clouds(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    size: int = 512,
    R: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
    focal_length: float = 1.0,
) -> jnp.ndarray:
    """points/colors: (B,N,3) in [-1,1]-ish -> rendered (B,3,size,size)."""
    points = points * jnp.asarray([1.0, 1.0, -1.0])
    if R is not None:
        points = points @ R
    if t is not None:
        points = points + t

    # pinhole projection: u = f*x/z + 0.5, v = f*y/z + 0.5
    z = points[..., 2:3]
    uv = focal_length * points[..., :2] / (z + 1e-12) + 0.5
    uv = uv * size
    mask = (uv > 0) & (uv < size - 1)
    mask = (mask[..., 0:1] & mask[..., 1:2]).astype(colors.dtype)
    colors = colors * mask

    uv = size - uv
    depth = jnp.linalg.norm(points, axis=-1, keepdims=True)
    weight = jnp.exp(-3.0 * depth) * (depth > 1e-8)
    bev = bilinear_rasterizer(uv, weight * colors, (size, size))
    bev = bev / (bilinear_rasterizer(uv, weight, (size, size)) + 1e-8)
    return bev
