"""FIR up/down resampling with ring (circular-azimuth) padding.

Behavioral equivalent of the reference `ops.Resample` (gans/models/ops/common.py:45-138),
which is the in-model replacement for StyleGAN2's CUDA upfirdn2d: margin pad (circular W /
replicate H) -> zero-insertion upsample -> crop -> separable FIR -> strided downsample.

TPU-first notes: the whole pipeline is expressed as jnp pads/reshapes plus two depthwise
`lax.conv_general_dilated` calls, which XLA fuses; the zero-insertion is folded into the
conv via `lhs_dilation` when upsampling so no zero-stuffed intermediate is materialized.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .pad import _pad_axis

__all__ = [
    "ResamplePlan", "resample", "make_resample", "resample_sumsq",
    "blur_vh", "upfirdn2d",
]


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=(1, 1),
    down=(1, 1),
    pad=(0, 0, 0, 0),  # (x0, x1, y0, y1) — may be negative (crop)
) -> jnp.ndarray:
    """Zero-insert upsample -> zero-pad -> FIR -> stride downsample, one fused conv.

    The TPU-native equivalent of the reference CUDA upfirdn2d
    (gans/models/ops/upfirdn2d/upfirdn2d_kernel.cu): expressed as a single
    lhs-dilated depthwise `lax.conv_general_dilated`, which XLA tiles directly.
    `kernel` is 1D (separable use) or 2D; NCHW layout. No kernel flip
    (cross-correlation), matching upfirdn2d_native's F.conv2d formulation.
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    px0, px1, py0, py1 = pad
    kernel = jnp.asarray(kernel, x.dtype)
    if kernel.ndim == 1:
        kernel = kernel.reshape(1, -1)
    kh, kw = kernel.shape
    C = x.shape[1]
    # reference pads the up-dilated tensor including up-1 trailing zeros; XLA's
    # lhs_dilation omits trailing zeros, so shift the high-side pad accordingly
    lo_h, hi_h = py0, py1 + (up[0] - 1)
    lo_w, hi_w = px0, px1 + (up[1] - 1)
    kern = jnp.broadcast_to(kernel.reshape(1, 1, kh, kw), (C, 1, kh, kw))
    return lax.conv_general_dilated(
        x,
        kern,
        window_strides=down,
        padding=((lo_h, hi_h), (lo_w, hi_w)),
        lhs_dilation=up,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def _pair(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


class ResamplePlan:
    """Precomputed static configuration for `resample` (mirrors Resample.__init__)."""

    def __init__(
        self,
        up=1,
        down=1,
        window: Sequence[float] = (1, 3, 3, 1),
        ring: bool = True,
        normalize: bool = True,
        direction: str = "hw",
    ):
        assert direction in ("h", "w", "hw")
        self.up = _pair(up)
        self.down = _pair(down)
        self.window = tuple(float(w) for w in window)
        self.n_taps = len(self.window)
        self.ring = ring
        self.pad_mode_w = "circular" if ring else "replicate"
        self.pad_mode_h = "replicate"
        self.direction = direction

        if "h" in direction:
            self.k_h, self.up_h, self.down_h = self.n_taps, self.up[0], self.down[0]
        else:
            self.k_h = self.up_h = self.down_h = 1
        if "w" in direction:
            self.k_w, self.up_w, self.down_w = self.n_taps, self.up[1], self.down[1]
        else:
            self.k_w = self.up_w = self.down_w = 1

        kernel = np.asarray(self.window, np.float32)
        if normalize:
            kernel = kernel / kernel.sum()
        kernel = kernel * (self.up_h * self.up_w) ** 0.5
        self.kernel = kernel  # numpy; cast at use

        # padding amounts (same formulas as the reference, common.py:89-103)
        if self.up[0] > 1:
            self.ph0 = (self.k_h - self.up_h + 1) // 2 + self.up_h - 1
            self.ph1 = (self.k_h - self.up_h) // 2
        else:
            self.ph0 = (self.k_h - self.down_h + 1) // 2
            self.ph1 = (self.k_h - self.down_h) // 2
        if self.up[1] > 1:
            self.pw0 = (self.k_w - self.up_w + 1) // 2 + self.up_w - 1
            self.pw1 = (self.k_w - self.up_w) // 2
        else:
            self.pw0 = (self.k_w - self.down_w + 1) // 2
            self.pw1 = (self.k_w - self.down_w) // 2

        self.margin = max(self.ph0, self.ph1, self.pw0, self.pw1)
        self.normalize = bool(normalize)

    # Value-based identity over the static config so lru_caches keyed on a plan
    # (e.g. _resample_gram) hit for plans constructed directly, not only for the
    # interned instances returned by make_resample.
    def _key(self):
        return (self.up, self.down, self.window, self.ring, self.normalize, self.direction)

    def __eq__(self, other):
        return isinstance(other, ResamplePlan) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def out_shape(self, h: int, w: int) -> Tuple[int, int]:
        oh = (h * self.up_h + self.ph0 + self.ph1 - self.k_h) // self.down_h + 1
        ow = (w * self.up_w + self.pw0 + self.pw1 - self.k_w) // self.down_w + 1
        return oh, ow


def _sep_conv(plan: ResamplePlan, x: jnp.ndarray) -> jnp.ndarray:
    """Fused zero-insert-upsample + crop + separable FIR + stride-downsample.

    `x` is the margin-padded input. We use lhs_dilation for the zero insertion and
    (possibly negative) conv padding for the crop; the result is numerically identical
    to the reference's materialized pipeline (proved by tests against a literal port).
    """
    B, C, H, W = x.shape
    m = plan.margin
    # Crop offsets relative to the zero-inserted array of the reference:
    #   start = m*up - p0 ; end = (size - m)*up + p1
    # XLA's lhs-dilated array has length (size-1)*up + 1 (no trailing zeros), so the
    # high-side pad needs up-1 fewer implicit elements accounted for.
    lo_h = plan.ph0 - m * plan.up_h
    hi_h = plan.ph1 - m * plan.up_h + (plan.up_h - 1)
    lo_w = plan.pw0 - m * plan.up_w
    hi_w = plan.pw1 - m * plan.up_w + (plan.up_w - 1)

    kern = jnp.asarray(plan.kernel, x.dtype)
    kh = plan.k_h if "h" in plan.direction else 1
    kw = plan.k_w if "w" in plan.direction else 1

    def dwconv(x, kernel_2d, strides, padding, lhs_dilation):
        kernel = jnp.broadcast_to(
            kernel_2d.reshape(1, 1, *kernel_2d.shape), (C, 1, *kernel_2d.shape)
        )
        return lax.conv_general_dilated(
            x,
            kernel,
            window_strides=strides,
            padding=padding,
            lhs_dilation=lhs_dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C,
        )

    if plan.direction == "hw":
        # W pass then H pass (reference does W first: conv with [..., None, :]).
        x = dwconv(
            x,
            kern.reshape(1, plan.k_w),
            strides=(1, plan.down_w),
            padding=((0, 0), (lo_w, hi_w)),
            lhs_dilation=(1, plan.up_w),
        )
        x = dwconv(
            x,
            kern.reshape(plan.k_h, 1),
            strides=(plan.down_h, 1),
            padding=((lo_h, hi_h), (0, 0)),
            lhs_dilation=(plan.up_h, 1),
        )
    elif plan.direction == "h":
        x = dwconv(
            x,
            kern.reshape(plan.k_h, 1),
            strides=(plan.down_h, plan.down_w),
            padding=((lo_h, hi_h), (lo_w, hi_w)),
            lhs_dilation=(plan.up_h, plan.up_w),
        )
    else:  # "w"
        x = dwconv(
            x,
            kern.reshape(1, plan.k_w),
            strides=(plan.down_h, plan.down_w),
            padding=((lo_h, hi_h), (lo_w, hi_w)),
            lhs_dilation=(plan.up_h, plan.up_w),
        )
    return x


def resample(x: jnp.ndarray, plan: ResamplePlan, method: str = "auto") -> jnp.ndarray:
    """Apply a resampling plan to an NCHW tensor.

    method:
      - "conv":   fused lhs-dilated depthwise convolutions (VPU-bound)
      - "matmul": the whole (linear) resampling op folded into two dense banded
                  matrices applied as einsums — rides the MXU; exactly equal by
                  construction (the matrices are built by applying the conv path to
                  identity bases, cached per (plan, H, W))
      - "auto":   matmul on TPU for 2D-direction plans, conv otherwise
    """
    if method == "auto":
        import jax

        method = "matmul" if jax.default_backend() != "cpu" else "conv"
    if method == "matmul":
        return _resample_matmul(x, plan)
    m = plan.margin
    x = _pad_axis(x, -1, m, m, plan.pad_mode_w)
    x = _pad_axis(x, -2, m, m, plan.pad_mode_h)
    return _sep_conv(plan, x)


@functools.lru_cache(maxsize=None)
def _resample_matrices(plan: ResamplePlan, H: int, W: int):
    """Dense (H_out,H) / (W_out,W) operators equal to the conv path on bases.

    Runs eagerly even when first reached inside a jit trace
    (jax.ensure_compile_time_eval): the basis probes are shape-only constants.
    """
    import numpy as _np

    import jax as _jax

    with _jax.ensure_compile_time_eval():
        return _resample_matrices_impl(plan, H, W)


def _resample_matrices_impl(plan: ResamplePlan, H: int, W: int):
    import numpy as _np

    def conv_path(x):
        m = plan.margin
        x = _pad_axis(x, -1, m, m, plan.pad_mode_w)
        x = _pad_axis(x, -2, m, m, plan.pad_mode_h)
        return _sep_conv(plan, x)

    # the op is a tensor product R_H (x) R_W (every pad/filter/stride step factorizes
    # per axis); recover each factor by applying the conv path to axis bases held
    # constant along the other axis (the normalized FIR preserves constants)
    wpad = 8  # wide enough for the W margin pad on the H-basis probe
    eyeH = jnp.broadcast_to(
        jnp.eye(H, dtype=jnp.float32).T[None, :, :, None], (1, H, H, wpad)
    )  # channel c = delta at row c, constant along W
    outH = conv_path(eyeH)
    Hmat = _np.asarray(outH[0, :, :, outH.shape[-1] // 2]).T  # (H_out, H)
    eyeW = jnp.broadcast_to(
        jnp.eye(W, dtype=jnp.float32)[None, :, None, :], (1, W, wpad, W)
    )  # channel c = delta at col c, constant along H
    outW = conv_path(eyeW)
    Wmat = _np.asarray(outW[0, :, outW.shape[-2] // 2, :]).T  # (W_out, W)
    return jnp.asarray(Hmat), jnp.asarray(Wmat)


def _resample_matmul(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    # NOTE (negative result, measured on v5e bf16 B=128): fusing the separable pair
    # into ONE matmul over the flattened spatial dim — (B,C,H*W) @ kron(Hmat,Wmat)^T,
    # compact lane tiles by construction — was tried to dodge the small-spatial tile
    # padding tax and LOST at every gated size (4x32: 1.90 vs 1.48 ms; 8x64: 2.14 vs
    # 1.88 ms; scripts history /tmp/resample_micro pattern). The separable einsum pair
    # below is the best known formulation at all scales (conv path is 2-4x slower).
    B, C, H, W = x.shape
    Hmat, Wmat = _resample_matrices(plan, H, W)
    dtype = x.dtype
    y = jnp.einsum(
        "bchw,pw->bchp", x, Wmat.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    y = jnp.einsum(
        "bchp,oh->bcop", y, Hmat.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    return y


@functools.lru_cache(maxsize=None)
def _resample_gram(plan: ResamplePlan, H: int, W: int):
    """Gram factors (G_H, G_W) of the separable resample at input resolution:
    G_H = Hmat^T Hmat (H, H), G_W = Wmat^T Wmat (W, W), accumulated in float64.

    Since resample(x) = Hmat @ x @ Wmat^T per (b, c) plane,
        sum(resample(x)^2) == sum(x * (G_H @ x @ G_W^T))
    — the hi-res mean-square statistic evaluated entirely at the LOW resolution.
    Also returns the output plane size Hout*Wout (the element count the statistic
    normalizes by)."""
    import jax

    with jax.ensure_compile_time_eval():
        Hmat, Wmat = _resample_matrices(plan, H, W)
        import numpy as _np

        Hm = _np.asarray(Hmat, _np.float64)
        Wm = _np.asarray(Wmat, _np.float64)
        GH = jnp.asarray((Hm.T @ Hm).astype(_np.float32))
        GW = jnp.asarray((Wm.T @ Wm).astype(_np.float32))
        return GH, GW, Hm.shape[0] * Wm.shape[0]


def resample_sumsq(x: jnp.ndarray, plan: ResamplePlan):
    """(sum(resample(x, plan)^2), number of resampled elements) WITHOUT materializing
    the resampled tensor: two small Gram einsums at x's own (low) resolution + one
    elementwise dot. Exact up to fp reassociation vs summing the squared hi-res
    output. Used by the train-mode resample→conv1 commute (models/dusty_v2.py):
    ModConv2d's ema_var statistic is defined on the RESAMPLED conv1 input
    (reference style.py:98-103), which was the only reason train mode materialized
    the hi-res input before the 1x1 contraction."""
    B, C, H, W = x.shape
    GH, GW, plane = _resample_gram(plan, H, W)
    x32 = x.astype(jnp.float32)
    y = jnp.einsum("bchw,vw->bchv", x32, GW, preferred_element_type=jnp.float32)
    y = jnp.einsum("bchv,uh->bcuv", y, GH, preferred_element_type=jnp.float32)
    return jnp.sum(x32 * y), B * C * plane


@functools.lru_cache(maxsize=None)
def make_resample(
    up=1, down=1, window=(1, 3, 3, 1), ring=True, normalize=True, direction="hw"
) -> ResamplePlan:
    """Cached plan constructor (hashable args only)."""
    return ResamplePlan(up, down, window, ring, normalize, direction)


def blur_vh(x: jnp.ndarray, window=(1, 2, 1), ring: bool = True) -> jnp.ndarray:
    """NR-GAN vertical/horizontal anti-aliasing: concat V-blur and H-blur, 2x channels.

    Matches reference `ops.BlurVH` (gans/models/ops/common.py:141-155).
    """
    pv = make_resample(window=tuple(window), ring=ring, direction="h")
    ph = make_resample(window=tuple(window), ring=ring, direction="w")
    return jnp.concatenate([resample(x, pv), resample(x, ph)], axis=1)
