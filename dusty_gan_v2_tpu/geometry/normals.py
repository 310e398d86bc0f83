"""Surface-normal estimation from coordinated (range-image) point clouds.

Behavioral equivalent of reference `gans/geometry.py:38-127`: for each pixel, pick the
adjacent neighbor pair (out of 8, paired with offset+2) minimizing total distance, and
take the cross product. W is padded circularly (azimuth periodicity), H replicated.

TPU-first: the 8 neighbor maps are built by static slicing of the padded tensor (no
gather), the closest-pair selection is a one-hot weighted sum (no dynamic indexing), so
everything fuses into elementwise VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.pad import _pad_axis

__all__ = ["estimate_surface_normal", "euler_rotation_matrix"]

# 8 adjacent offsets (dh, dw), counter-clockwise from "left"
_OFFSETS = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def estimate_surface_normal(
    points: jnp.ndarray, d: int = 2, mode: str = "closest"
) -> jnp.ndarray:
    """points: (B, 3, H, W) -> unit normals (B, 3, H, W)."""
    assert points.ndim == 4 and points.shape[1] == 3, points.shape
    B, _, H, W = points.shape

    padded = _pad_axis(points, -2, d, d, "replicate")
    padded = _pad_axis(padded, -1, d, d, "circular")
    p = padded.transpose(0, 2, 3, 1)  # (B, H+2d, W+2d, 3)

    def shifted(dh, dw):
        return p[:, d + dh * d : d + dh * d + H, d + dw * d : d + dw * d + W]

    anchors = shifted(0, 0)  # (B, H, W, 3)
    n1 = jnp.stack([shifted(dh, dw) for dh, dw in _OFFSETS], axis=1)  # (B, 8, H, W, 3)
    n2 = jnp.stack(
        [shifted(*_OFFSETS[(k + 2) % 8]) for k in range(8)], axis=1
    )  # (B, 8, H, W, 3)

    v1 = n1 - anchors[:, None]
    v2 = n2 - anchors[:, None]
    if mode == "closest":
        diff = jnp.linalg.norm(v1, axis=4) + jnp.linalg.norm(v2, axis=4)  # (B,8,H,W)
        best = jnp.argmin(diff, axis=1)  # (B,H,W)
        sel = (jnp.arange(8)[None, :, None, None] == best[:, None]).astype(
            points.dtype
        )[..., None]
        v1 = jnp.sum(v1 * sel, axis=1)
        v2 = jnp.sum(v2 * sel, axis=1)
        normals = jnp.cross(v1, v2, axis=-1)  # (B,H,W,3)
    elif mode == "mean":
        normals = jnp.mean(jnp.cross(v1, v2, axis=-1), axis=1)
    else:
        raise NotImplementedError(mode)

    normals = normals / (jnp.linalg.norm(normals, axis=3, keepdims=True) + 1e-8)
    return normals.transpose(0, 3, 1, 2)


def euler_rotation_matrix(theta) -> jnp.ndarray:
    """R = Rz(theta2) @ Ry(theta1) @ Rx(theta0) (reference geometry.py:5-35)."""
    tx, ty, tz = theta[0], theta[1], theta[2]
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
