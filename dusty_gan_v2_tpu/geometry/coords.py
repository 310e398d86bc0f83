"""CoordBridge: conversions between range-image encodings and 3D point clouds over a
fixed laser-angle grid.

Behavioral equivalent of reference `gans/coords.py:42-199`. The angle LUT (H0,W0,2) is
resampled to the model resolution via periodic sin/cos bilinear interpolation with
torch's align_corners=False semantics (tested against F.interpolate).

Normalization convention (reference coords.py + configs): `inv_depth_norm =
min_depth/depth in (0,1]`, zero == dropped ray.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .normals import estimate_surface_normal
from .render import render_point_clouds

__all__ = ["CoordBridge", "COORD_TYPES", "bilinear_resize"]

COORD_TYPES = (
    "depth",
    "depth_norm",
    "inv_depth",
    "inv_depth_norm",
    "point_map",
    "point_set",
    "normal_map",
)


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NCHW bilinear resize with torch F.interpolate(align_corners=False) semantics:
    half-pixel source coords clamped at 0, edge-clamped high index."""
    H, W = x.shape[-2:]
    OH, OW = size

    def axis_idx(n_in, n_out):
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.maximum(src, 0.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.minimum(i0, n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        w = (src - i0.astype(jnp.float32)).astype(x.dtype)
        return i0, i1, w

    y0, y1, wy = axis_idx(H, OH)
    x0, x1, wx = axis_idx(W, OW)
    top = x[..., y0, :]
    bot = x[..., y1, :]
    rows = top * (1 - wy)[:, None] + bot * wy[:, None]  # (..., OH, W)
    left = rows[..., x0]
    right = rows[..., x1]
    return left * (1 - wx) + right * wx


def resize_angle_lut(angle_hw2: np.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(H0, W0, 2) angle LUT -> (1, 2, H, W), resampled periodically in W via sin/cos
    (reference coords.py:59-71)."""
    angle = jnp.asarray(angle_hw2, jnp.float32).transpose(2, 0, 1)[None]  # (1,2,H0,W0)
    periodic = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=1)
    periodic = jnp.concatenate([periodic] * 3, axis=3)  # tile W x3 for periodicity
    periodic = bilinear_resize(periodic, (size[0], size[1] * 3))
    periodic = periodic[..., size[1] : 2 * size[1]]
    return jnp.arctan2(periodic[:, :2], periodic[:, 2:])


class CoordBridge:
    """Not a module — a plain geometry helper holding the angle grid and depth range."""

    def __init__(
        self,
        num_ring: int,
        num_points: int,
        min_depth: float,
        max_depth: float,
        angle_file: Optional[str] = None,
        angle: Optional[np.ndarray] = None,
        raydrop_const: float = 0.0,
    ):
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        assert self.max_depth > self.min_depth
        self.H, self.W = num_ring, num_points
        self.raydrop_const = raydrop_const
        if angle is None:
            assert angle_file is not None
            angle = np.load(angle_file)  # (H0, W0, 2) = (elevation, azimuth)
        if angle.ndim == 3:  # raw LUT
            self.angle = resize_angle_lut(angle, (self.H, self.W))
        else:  # already (1,2,H,W)
            self.angle = jnp.asarray(angle)

    # ------------------------------------------------------------------
    def get_mask(self, x, coord):
        if coord == "depth":
            return (x >= self.min_depth) & (x <= self.max_depth) & (x > 0.0)
        if coord == "inv_depth":
            return (x >= 1.0 / self.max_depth) & (x <= 1.0 / self.min_depth) & (x > 0.0)
        if coord in ("depth_norm", "inv_depth_norm"):
            return (x > 0.0) & (x <= 1.0)
        raise NotImplementedError(coord)

    def convert(self, x, src, tgt, tol=1e-11):
        """Convert among the 7 coordinate types with validity masking
        (reference coords.py:88-176)."""
        assert src in COORD_TYPES, src
        assert tgt in COORD_TYPES, tgt
        if src == tgt:
            return x

        if src == "depth":
            if tgt in ("inv_depth", "inv_depth_norm"):
                valid = self.get_mask(x, src).astype(x.dtype)
                inv_depth = 1.0 / (x + tol) * valid
                if tgt == "inv_depth_norm":
                    return self.convert(inv_depth, "inv_depth", tgt)
                return inv_depth
            if tgt == "depth_norm":
                return x / self.max_depth
            if tgt in ("point_map", "point_set", "normal_map"):
                pm = self.depth_to_point_map(x)
                if tgt == "point_map":
                    return pm
                return self.convert(pm, "point_map", tgt)
        elif src == "depth_norm":
            depth = x * self.max_depth
            if tgt == "depth":
                return depth
            if tgt in ("inv_depth", "inv_depth_norm", "point_map", "point_set"):
                return self.convert(depth, "depth", tgt)
        elif src == "inv_depth":
            if tgt == "inv_depth_norm":
                return x * self.min_depth
            if tgt in ("depth", "depth_norm"):
                valid = self.get_mask(x, src).astype(x.dtype)
                depth = 1.0 / (x + tol) * valid
                if tgt == "depth_norm":
                    return self.convert(depth, "depth", tgt)
                return depth
        elif src == "inv_depth_norm":
            if tgt == "inv_depth":
                return x / self.min_depth
            if tgt in ("depth", "depth_norm"):
                return self.convert(x / self.min_depth, "inv_depth", tgt)
            if tgt in ("point_map", "point_set", "normal_map"):
                valid = (x > tol).astype(x.dtype)
                inv_depth = x / self.min_depth
                valid = valid * self.get_mask(inv_depth, "inv_depth").astype(x.dtype)
                depth = 1.0 / (inv_depth + tol) * valid
                pm = self.convert(depth, "depth", "point_map")
                if tgt == "point_map":
                    return pm
                return self.convert(pm, "point_map", tgt)
        elif src == "point_map":
            if tgt == "point_set":
                B, C = x.shape[:2]
                return x.reshape(B, C, -1).transpose(0, 2, 1)
            if tgt in ("depth", "depth_norm", "inv_depth", "inv_depth_norm"):
                depth = jnp.linalg.norm(x, axis=1, keepdims=True)
                if tgt == "depth":
                    return depth
                return self.convert(depth, "depth", tgt)
            if tgt == "normal_map":
                pm = x / self.max_depth
                normals = -estimate_surface_normal(pm, d=2)
                return jnp.nan_to_num(normals, nan=0.0)
        raise NotImplementedError(f"{src} to {tgt}")

    def depth_to_point_map(self, depth):
        """Spherical -> Cartesian over the angle grid (reference coords.py:178-185)."""
        assert depth.ndim == 4
        elev, azim = self.angle[:, 0:1], self.angle[:, 1:2]
        x = depth * jnp.cos(elev) * jnp.cos(azim)
        y = depth * jnp.cos(elev) * jnp.sin(azim)
        z = depth * jnp.sin(elev)
        return jnp.concatenate([x, y, z], axis=1)

    def make_birds_eye_view(self, inv_depth_norm, Rt):
        """BEV rendering of an inv-depth-norm image, colored by surface normals
        (reference coords.py:187-196)."""
        from ..utils import points_to_normal_2d

        R, t = Rt
        W = inv_depth_norm.shape[-1]
        points = self.convert(inv_depth_norm, "inv_depth_norm", "point_map")
        points = points / self.max_depth
        normal = points_to_normal_2d(points, mode="closest")
        B = points.shape[0]
        pts = points.reshape(B, 3, -1).transpose(0, 2, 1)
        cols = normal.reshape(B, 3, -1).transpose(0, 2, 1)
        return render_point_clouds(pts, cols, size=W, R=R, t=t)
