"""Pallas-fused elementwise->resample chains (training-step bandwidth relief).

The discriminator's per-resblock chain `bias_act -> blur` (and the generator's
act -> resample sites) execute on TPU as separate HLOs: the activation writes a
full tensor to HBM, the blur's W-pass matmul reads it back, writes again, and the
H-pass reads/writes once more (plus possible layout shuffles around the H
contraction). Each full-resolution pass at training config (B=128, 32ch, 64x512,
bf16) moves ~268 MB. This module fuses the whole chain into ONE Pallas kernel:
per grid step a (P, H, W) plane tile is read from HBM once, the bias+leaky-ReLU
runs on the VPU, both separable resample matmuls run on the MXU from VMEM, and
only the (P, Ho, Wo) result is written back.

The resample math reuses the exact dense operator matrices of ops/resample.py
(`_resample_matrices`, built by pushing identity bases through the reference
pipeline), so the fused op equals `resample(fused_leaky_relu(x, b), plan)`
exactly up to fp reassociation. Backward is a custom VJP: the adjoint resample
(transposed matrices) and the activation mask are fused in a second Pallas
kernel; d(bias) is a plain XLA reduction over dx.

Reference counterpart: fused_bias_act + ops.Resample back-to-back
(gans/models/ops/fused_act/fused_act.py:93-129, gans/models/ops/common.py:45-138).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .resample import ResamplePlan, _resample_matrices

__all__ = ["fused_act_resample", "pallas_resample"]


def _pick_tile(n_planes: int, h: int, w: int, ho: int, wo: int) -> int:
    """Planes per grid step: target ~1 MB of input tile in VMEM, power-of-two,
    dividing the plane count. Capped at 8 — the kernel body is a static Python
    unroll over the planes (Mosaic needs plain 2-D matmuls), so P is also the
    unroll factor."""
    target = min(8, max(1, (1 << 20) // max(h * w * 2, 1)))
    p = 1
    while p * 2 <= target and n_planes % (p * 2) == 0:
        p *= 2
    return p


@functools.lru_cache(maxsize=None)
def _fwd_call(negative_slope: float, scale: float, P: int, H: int, W: int,
              Ho: int, Wo: int, dtype_name: str, interpret: bool,
              with_act: bool = True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)

    def kernel(x_ref, b_ref, wm_ref, hm_ref, o_ref):
        # Per-plane 2-D matmuls: Mosaic has no lowering for collapsing (H, W)
        # into one vector dim ("unsupported shape cast") or for the 3-D
        # batched-dot transpose, so the P-loop stays a static Python unroll of
        # plain (rows, cols) MXU ops.
        for p in range(P):
            if with_act:
                x = x_ref[p].astype(jnp.float32)  # (H, W)
                y = x + b_ref[p, 0].astype(jnp.float32)  # scalar from SMEM
                y = jnp.where(y >= 0, y, y * negative_slope) * scale
                y = y.astype(dtype)
            else:
                y = x_ref[p]
            # W pass: (H, W) @ (W, Wo)
            z = jax.lax.dot_general(
                y, wm_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            # H pass: (Ho, H) @ (H, Wo)
            o_ref[p] = jax.lax.dot_general(
                hm_ref[:], z, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)

    def call(x3, b2, wmT, hm, n_planes):
        grid = (n_planes // P,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_planes, Ho, Wo), dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((P, H, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((P, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((W, Wo), lambda i: (0, 0)),
                pl.BlockSpec((Ho, H), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((P, Ho, Wo), lambda i: (i, 0, 0)),
            interpret=interpret,
        )(x3, b2, wmT, hm)

    return call


@functools.lru_cache(maxsize=None)
def _bwd_call(negative_slope: float, scale: float, P: int, H: int, W: int,
              Ho: int, Wo: int, dtype_name: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)

    def kernel(g_ref, x_ref, b_ref, wm_ref, hm_ref, dx_ref):
        # Per-plane 2-D matmuls (see _fwd_call: Mosaic rejects the collapsed
        # reshape / 3-D dot transpose forms).
        for p in range(P):
            g = g_ref[p]  # (Ho, Wo)
            # adjoint H pass: (H, Ho) @ (Ho, Wo)
            t = jax.lax.dot_general(
                hm_ref[:], g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            # adjoint W pass: (H, Wo) @ (Wo, W)
            gy = jax.lax.dot_general(
                t, wm_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pre = x_ref[p].astype(jnp.float32) + b_ref[p, 0].astype(jnp.float32)
            mask = jnp.where(pre >= 0, scale, scale * negative_slope)
            dx_ref[p] = (gy * mask).astype(dtype)

    def call(g3, x3, b2, wmT_adj, hm_adj, n_planes):
        grid = (n_planes // P,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_planes, H, W), dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((P, Ho, Wo), lambda i: (i, 0, 0)),
                pl.BlockSpec((P, H, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((P, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((Wo, W), lambda i: (0, 0)),
                pl.BlockSpec((H, Ho), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((P, H, W), lambda i: (i, 0, 0)),
            interpret=interpret,
        )(g3, x3, b2, wmT_adj, hm_adj)

    return call


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_act_resample(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    plan: ResamplePlan,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    """resample(leaky_relu(x + bias[c]) * scale, plan) in one HBM pass.

    x: (B, C, H, W); bias: (C,). Equals the unfused pair exactly up to fp
    reassociation (tests/test_fused_chain.py).
    """
    return _fwd_impl(x, bias, plan, negative_slope, scale)


def _fwd_impl(x, bias, plan, negative_slope, scale, with_act=True):
    B, C, H, W = x.shape
    Hmat, Wmat = _resample_matrices(plan, H, W)
    Ho, Wo = Hmat.shape[0], Wmat.shape[0]
    N = B * C
    P = _pick_tile(N, H, W, Ho, Wo)
    call = _fwd_call(float(negative_slope), float(scale), P, H, W, Ho, Wo,
                     x.dtype.name, _use_interpret(), with_act)
    x3 = x.reshape(N, H, W)
    if with_act:
        b2 = jnp.tile(bias.astype(x.dtype), B).reshape(N, 1)
    else:
        b2 = jnp.zeros((N, 1), x.dtype)
    wmT = jnp.asarray(Wmat, x.dtype).T  # (W, Wo)
    hm = jnp.asarray(Hmat, x.dtype)  # (Ho, H)
    out = call(x3, b2, wmT, hm, N)
    return out.reshape(B, C, Ho, Wo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pallas_resample(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    """Single-HBM-pass resample: both separable matmuls inside one Pallas kernel
    (act-free variant of `fused_act_resample`; e.g. the D skip-path blur)."""
    return _fwd_impl(x, None, plan, 0.0, 1.0, with_act=False)


def _pr_fwd(x, plan):
    # residual: a 0-sized slice carrying x's shape/dtype statically (residual
    # leaves must be arrays; x itself would pin the full tensor in HBM)
    return (
        _fwd_impl(x, None, plan, 0.0, 1.0, with_act=False),
        jax.lax.slice_in_dim(x, 0, 0, axis=0),
    )


def _pr_bwd(plan, res, g):
    dtype = res.dtype
    _, C, H, W = res.shape
    B = g.shape[0]
    Hmat, Wmat = _resample_matrices(plan, H, W)
    Ho, Wo = Hmat.shape[0], Wmat.shape[0]
    N = B * C
    # adjoint resample = same kernel with transposed matrices (swap roles/sizes)
    P = _pick_tile(N, Ho, Wo, H, W)
    call = _fwd_call(0.0, 1.0, P, Ho, Wo, H, W, jnp.dtype(dtype).name,
                     _use_interpret(), False)
    g3 = g.reshape(N, Ho, Wo).astype(dtype)
    b2 = jnp.zeros((N, 1), dtype)
    wmT_adj = jnp.asarray(Wmat, dtype)  # (Wo, W)
    hm_adj = jnp.asarray(Hmat, dtype).T  # (H, Ho)
    dx = call(g3, b2, wmT_adj, hm_adj, N)
    return (dx.reshape(B, C, H, W),)


pallas_resample.defvjp(_pr_fwd, _pr_bwd)


def _far_fwd(x, bias, plan, negative_slope, scale):
    return _fwd_impl(x, bias, plan, negative_slope, scale), (x, bias)


def _far_bwd(plan, negative_slope, scale, res, g):
    x, bias = res
    B, C, H, W = x.shape
    Hmat, Wmat = _resample_matrices(plan, H, W)
    Ho, Wo = Hmat.shape[0], Wmat.shape[0]
    N = B * C
    P = _pick_tile(N, H, W, Ho, Wo)
    call = _bwd_call(float(negative_slope), float(scale), P, H, W, Ho, Wo,
                     x.dtype.name, _use_interpret())
    g3 = g.reshape(N, Ho, Wo).astype(x.dtype)
    x3 = x.reshape(N, H, W)
    b2 = jnp.tile(bias.astype(x.dtype), B).reshape(N, 1)
    wmT_adj = jnp.asarray(Wmat, x.dtype)  # (Wo, W): contraction with Wo
    hm_adj = jnp.asarray(Hmat, x.dtype).T  # (H, Ho)
    dx3 = call(g3, x3, b2, wmT_adj, hm_adj, N)
    dx = dx3.reshape(B, C, H, W)
    db = jnp.sum(dx.astype(jnp.float32), axis=(0, 2, 3)).astype(bias.dtype)
    return dx, db


fused_act_resample.defvjp(_far_fwd, _far_bwd)
