"""Fused bias + leaky-ReLU + scale.

Behavioral equivalent of the reference CUDA `fused_bias_act` kernel
(gans/models/ops/fused_act/fused_bias_act_kernel.cu, fused_act.py:93-129):
    y = leaky_relu(x + bias[channel], negative_slope) * scale
with default negative_slope=0.2, scale=sqrt(2).

On TPU the XLA compiler fuses this elementwise chain into the producing matmul/conv, so
the jnp version is already "fused" in the CUDA sense. A Pallas kernel is provided as well
(used for large standalone activations and as a building block for fused modconv); both
paths are differentiable to arbitrary order (the reference needed a hand-written
double-backward for R1/PL regularizers — JAX gets it for free, and the Pallas path
defines a custom VJP whose backward is itself expressed in differentiable jnp ops).
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["fused_leaky_relu", "fused_leaky_relu_pallas", "FusedLeakyReLU"]


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = 1,
) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale, bias broadcast over the channel axis."""
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape).astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


class FusedLeakyReLU(nn.Module):
    """Learned per-channel bias + leaky ReLU + sqrt(2) scale (reference FusedLeakyReLU
    module, fused_act.py:93-109)."""

    ch: int
    use_bias: bool = True
    negative_slope: float = 0.2
    scale: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x):
        bias = (
            self.param("bias", nn.initializers.zeros, (self.ch,))
            if self.use_bias
            else None
        )
        return fused_leaky_relu(x, bias, self.negative_slope, self.scale)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _build_pallas_fn(negative_slope: float, scale: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[:]
        b = b_ref[:]  # (C, 1) broadcast over last dim
        y = x + b
        o_ref[:] = jnp.where(y >= 0, y, y * negative_slope) * scale

    def call(x2d, b2d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x2d, b2d)

    return call


@functools.lru_cache(maxsize=None)
def _pallas_impl(negative_slope: float, scale: float):
    return _build_pallas_fn(negative_slope, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(x, bias, negative_slope=0.2, scale=math.sqrt(2.0)):
    """Pallas TPU version of fused_leaky_relu for NCHW / NC tensors (bias over axis 1)."""
    B, C = x.shape[0], x.shape[1]
    spatial = math.prod(x.shape[2:]) if x.ndim > 2 else 1
    x2d = x.reshape(B * C, spatial)
    # bias per (B*C) row
    b = jnp.tile(bias, B).reshape(B * C, 1).astype(x.dtype)
    y = _pallas_impl(negative_slope, scale)(x2d, b)
    return y.reshape(x.shape)


def _flr_fwd(x, bias, negative_slope, scale):
    y = fused_leaky_relu_pallas(x, bias, negative_slope, scale)
    return y, (y,)


def _flr_bwd(negative_slope, scale, res, g):
    (y,) = res
    # y > 0 <=> pre-activation > 0 (scale > 0); same trick as the reference backward
    # which recomputes the mask from the output (fused_bias_act grad mode).
    dx = jnp.where(y >= 0, g, g * negative_slope) * scale
    axes = (0,) + tuple(range(2, y.ndim))
    db = dx.sum(axis=axes)
    return dx, db


fused_leaky_relu_pallas.defvjp(_flr_fwd, _flr_bwd)
