"""Ring (circular-azimuth) padding and separable filtering.

LiDAR range images are periodic along the azimuth (width) axis, so every spatial op in
this framework pads W circularly and H with replicate/reflect. This mirrors the behavior
of the reference `ops.Pad` / `filter2d` (reference: gans/models/ops/common.py:10-42) but
is a TPU-first functional implementation: padding is expressed with jnp slicing/concat so
XLA can fuse it into the consuming convolution.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

__all__ = ["pad2d", "pad_ring", "filter2d"]


def _pad_axis(x: jnp.ndarray, axis: int, lo: int, hi: int, mode: str) -> jnp.ndarray:
    """Pad one axis by (lo, hi) with the given mode.

    Modes match torch.nn.functional.pad semantics:
      - "circular": wrap-around
      - "replicate": edge replication
      - "reflect": mirror without repeating the edge
      - "zeros": constant zero
    """
    if lo == 0 and hi == 0:
        return x
    n = x.shape[axis]

    def take(start, stop):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, stop)
        return x[tuple(idx)]

    if mode == "zeros":
        cfg = [(0, 0, 0)] * x.ndim
        cfg[axis] = (lo, hi, 0)
        return lax.pad(x, jnp.zeros((), x.dtype), cfg)
    if mode == "circular":
        assert lo <= n and hi <= n, f"circular pad ({lo},{hi}) > size {n}"
        parts = []
        if lo > 0:
            parts.append(take(n - lo, n))
        parts.append(x)
        if hi > 0:
            parts.append(take(0, hi))
        return jnp.concatenate(parts, axis=axis)
    if mode == "replicate":
        parts = []
        if lo > 0:
            edge = take(0, 1)
            parts.append(jnp.concatenate([edge] * lo, axis=axis) if lo > 1 else edge)
        parts.append(x)
        if hi > 0:
            edge = take(n - 1, n)
            parts.append(jnp.concatenate([edge] * hi, axis=axis) if hi > 1 else edge)
        return jnp.concatenate(parts, axis=axis)
    if mode == "reflect":
        assert lo < n and hi < n
        parts = []
        if lo > 0:
            parts.append(jnp.flip(take(1, lo + 1), axis=axis))
        parts.append(x)
        if hi > 0:
            parts.append(jnp.flip(take(n - hi - 1, n - 1), axis=axis))
        return jnp.concatenate(parts, axis=axis)
    raise ValueError(f"unknown pad mode: {mode}")


def pad2d(
    x: jnp.ndarray,
    padding,  # (left, right, top, bottom) or int
    ring: bool = False,
    mode: str = "replicate",
) -> jnp.ndarray:
    """Pad an NCHW tensor: W with `circular` when ring else `mode`; H with `mode`.

    Equivalent to the reference `ops.Pad` (gans/models/ops/common.py:10-24).
    """
    if isinstance(padding, int):
        left = right = top = bottom = padding
    else:
        left, right, top, bottom = padding
    horizontal = "circular" if ring else mode
    x = _pad_axis(x, -1, left, right, horizontal)
    x = _pad_axis(x, -2, top, bottom, mode)
    return x


# Back-compat name used around the codebase.
pad_ring = pad2d


def _depthwise_conv_1d(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """VALID depthwise conv of NCHW `x` with a 1D kernel along H (axis=-2) or W (axis=-1).

    Note: like torch F.conv2d, this is cross-correlation (no kernel flip); all our
    kernels are symmetric anyway.
    """
    C = x.shape[1]
    k = kernel.shape[0]
    if axis == -1:
        kern = jnp.broadcast_to(kernel.reshape(1, 1, 1, k), (C, 1, 1, k))
    else:
        kern = jnp.broadcast_to(kernel.reshape(1, 1, k, 1), (C, 1, k, 1))
    return lax.conv_general_dilated(
        x,
        kern.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def filter2d(x: jnp.ndarray, kernel: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Separable blur with circular-W / replicate-H padding.

    Matches reference `filter2d` (gans/models/ops/common.py:27-42): the 1D kernel is
    normalized to sum 1, scaled by gain**0.5 (applied twice -> gain), padded
    (fw//2, (fw-1)//2) and applied separably W then H.
    """
    kernel = jnp.asarray(kernel, jnp.float32)
    assert kernel.ndim == 1
    kernel = kernel / kernel.sum()
    kernel = kernel * (gain ** (1 / 2))
    f = kernel.shape[0]
    p0, p1 = f // 2, (f - 1) // 2
    x = _pad_axis(x, -1, p0, p1, "circular")
    x = _pad_axis(x, -2, p0, p1, "replicate")
    x = _depthwise_conv_1d(x, kernel, axis=-1)
    x = _depthwise_conv_1d(x, kernel, axis=-2)
    return x
