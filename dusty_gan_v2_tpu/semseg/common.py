"""Semseg building blocks (behavioral equivalents of reference semseg/models/common.py).

All conv weights use the torch layout (O,I,kh,kw) so the released semseg checkpoints
convert by renaming. BatchNorm follows torch semantics: momentum m means
running = (1-m)*running + m*batch (flax momentum = 1 - m).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..parallel.persample import axis_pmean, axis_size as _axis_size, global_ids, per_sample_keys

__all__ = [
    "TorchConv2d",
    "BatchNorm2d",
    "ConvReLU",
    "ConvReLUNorm",
    "DeconvReLU",
    "HeadConv",
    "max_pool2d",
    "set_max_pool_impl",
    "set_bn_one_pass",
    "unfold_neighbors",
    "setup_in_ch",
    "trunc_normal_init",
    "xavier_uniform_init",
]

# Trace-time implementation switches (exact reformulations, measured on-chip by
# scripts/bench_semseg_parts.py; see BASELINE.md semseg section). Both selections
# are read while tracing, so flipping them requires a re-jit — the production
# CLIs set them once at startup. Defaults are the measured TPU winners (B=40
# bf16 step 170.5 -> 90.5 ms with the contraction loss): "separable" max pools
# (2k taps + two small select_and_scatter VJPs instead of k^2) and one-pass BN
# moments (single activation read). "reduce_window"/two-pass remain selectable
# for A/B and as the literal-reference forms.
_POOL_IMPL = "separable"  # "reduce_window" | "shift" | "separable"
_BN_ONE_PASS = True


def set_max_pool_impl(impl: str):
    global _POOL_IMPL
    assert impl in ("reduce_window", "shift", "separable"), impl
    _POOL_IMPL = impl


def set_bn_one_pass(flag: bool):
    global _BN_ONE_PASS
    _BN_ONE_PASS = bool(flag)


def setup_in_ch(inputs):
    channels = {"xyz": 3, "depth": 1, "reflectance": 1, "mask": 1}
    return sum(channels[m] for m in inputs)


def trunc_normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        # torch trunc_normal_(std=s) truncates at absolute +-2; for the stds used here
        # (0.001 / 0.1) that is >= 20 sigma, so a plain +-2-sigma truncation is fine
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def xavier_uniform_init():
    def init(key, shape, dtype=jnp.float32):
        # shape (O,I,kh,kw)
        fan_out = shape[0] * shape[2] * shape[3]
        fan_in = shape[1] * shape[2] * shape[3]
        a = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def _torch_conv_default_init(key, shape, dtype=jnp.float32):
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-b, b), b = 1/sqrt(fan_in)
    fan_in = shape[1] * shape[2] * shape[3]
    b = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -b, b)


class TorchConv2d(nn.Module):
    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        init = self.kernel_init or _torch_conv_default_init
        w = self.param("weight", init, (self.out_ch, self.in_ch, kh, kw))
        y = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=self.stride,
            padding=((self.padding[0],) * 2, (self.padding[1],) * 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.reshape(1, -1, 1, 1).astype(x.dtype)
        return y


class BatchNorm2d(nn.Module):
    ch: int
    momentum: float = 0.001  # torch convention

    @nn.compact
    def __call__(self, x, train: bool = False):
        gamma = self.param("weight", nn.initializers.ones, (self.ch,))
        beta = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "running_mean",
                             lambda: jnp.zeros((self.ch,)))
        var = self.variable("batch_stats", "running_var",
                            lambda: jnp.ones((self.ch,)))
        # statistics in at-least-float32: under a bf16 compute policy the conv
        # activations arrive in bf16, but batch mean/var and the running-stat
        # EMA need full precision (bf16 has ~3 decimal digits). float64 inputs
        # keep float64 (the device-count-invariance test runs the whole model in
        # f64, where invariance is exact instead of ReLU-flip-limited).
        x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if train:
            axes = (0, 2, 3)
            # cross-shard moments when a data axis is bound — SyncBatchNorm semantics
            # (reference train_semseg.py:173): normalize with GLOBAL batch statistics,
            # so the step is identical on any mesh size (equal shard sizes). Two-pass
            # (center on the global mean, then pmean the local second moments): the
            # E[x^2]-m^2 form loses ~3 digits to cancellation and breaks invariance.
            m = axis_pmean(jnp.mean(x32, axis=axes))
            if _BN_ONE_PASS:
                # One-pass moments: center the second moment on the RUNNING mean —
                # a constant c, so mean(x) and mean((x-c)^2) are independent
                # reductions and XLA multi-output fusion reads the activation ONCE
                # (the m-centered form above forces a second pass because v depends
                # on m). v = E[(x-c)^2] - (m-c)^2 is the same value and the same
                # analytic x-gradient (d/dx_i = 2(x_i-m)/N) as the two-pass form;
                # unlike the naive c=0 E[x^2]-m^2 form the cancellation term
                # (m-c)^2 tracks ~0 because c follows m, so no precision digits
                # are lost. Per-shard means then pmean keeps the value identical
                # on any mesh size (device-count invariance preserved).
                c = lax.stop_gradient(mean.value).astype(x32.dtype)
                ex2c = axis_pmean(
                    jnp.mean(jnp.square(x32 - c.reshape(1, -1, 1, 1)), axis=axes)
                )
                v = jnp.maximum(ex2c - jnp.square(m - c), 0.0)
            else:
                v = axis_pmean(
                    jnp.mean(jnp.square(x32 - m.reshape(1, -1, 1, 1)), axis=axes)
                )
            if not self.is_initializing():
                n = x.shape[0] * x.shape[2] * x.shape[3] * _axis_size()
                unbiased = v * n / max(n - 1, 1)
                mean.value = (1 - self.momentum) * mean.value + self.momentum * m
                var.value = (1 - self.momentum) * var.value + self.momentum * unbiased
        else:
            m, v = mean.value, var.value
        shape = (1, -1, 1, 1)
        inv = lax.rsqrt(v.reshape(shape) + 1e-5)
        out = (x32 - m.reshape(shape)) * inv * gamma.reshape(shape) + beta.reshape(shape)
        return out.astype(x.dtype)


class ConvReLU(nn.Module):
    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv2d(
            self.in_ch, self.out_ch, self.kernel_size, self.stride, self.padding,
            kernel_init=self.kernel_init, name="conv",
        )(x)
        return jax.nn.relu(x)


class ConvReLUNorm(nn.Module):
    """conv -> ReLU -> BN (SqueezeSegV2 ordering, reference common.py:73-79)."""

    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    bn_momentum: float = 0.001
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv2d(
            self.in_ch, self.out_ch, self.kernel_size, self.stride, self.padding,
            kernel_init=self.kernel_init, name="conv",
        )(x)
        x = jax.nn.relu(x)
        return BatchNorm2d(self.out_ch, self.bn_momentum, name="bn")(x, train=train)


def _bilinear_deconv_init(key, shape, dtype=jnp.float32):
    """(I,O,1,4) transposed-conv weight: fixed W-bilinear [1,3,3,1]/8*2 on the diagonal
    (reference common.py:28-37)."""
    in_ch = shape[0]
    w = np.zeros(shape, np.float32)
    k = np.array([1, 3, 3, 1], np.float32)
    k = k / k.sum() * 2.0
    for c in range(in_ch):
        w[c, c, 0] = k
    return jnp.asarray(w)


class DeconvReLU(nn.Module):
    """W-only 2x transposed conv (1,4)/(1,2)/(0,1) with frozen-at-init bilinear weights
    -> ReLU (reference common.py:91-111)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("weight", _bilinear_deconv_init, (self.in_ch, self.out_ch, 1, 4))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        w_t = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)
        y = lax.conv_general_dilated(
            x,
            w_t.astype(x.dtype),
            window_strides=(1, 1),
            padding=((0, 0), (2, 2)),  # k-1-p = 4-1-1
            lhs_dilation=(1, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = y + b.reshape(1, -1, 1, 1).astype(x.dtype)
        return jax.nn.relu(y)


class HeadConv(nn.Module):
    """Dropout2d + conv (reference common.py:114-119)."""

    in_ch: int
    out_ch: int
    kernel_size: int = 3
    dropout_p: float = 0.5
    kernel_init: Optional[object] = None
    bias_init_values: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train and self.dropout_p > 0:
            # Dropout2d: whole channels dropped; per-sample keys by global id so the
            # mask is device-count invariant (parallel/persample.py)
            keys = per_sample_keys(self.make_rng("dropout"), global_ids(x.shape[0]))
            keep = jax.vmap(
                lambda k: jax.random.bernoulli(k, 1.0 - self.dropout_p, (x.shape[1], 1, 1))
            )(keys)
            x = x * keep / (1.0 - self.dropout_p)
        k = self.kernel_size

        def bias_init(key, shape, dtype=jnp.float32):
            if self.bias_init_values is not None:
                # class-frequency logit bias: -log((1-p)/p) (train_semseg.py:165-168)
                p = jnp.asarray(self.bias_init_values, dtype)
                return -jnp.log((1 - p) / p)
            return jnp.zeros(shape, dtype)

        kh = kw = k
        w = self.param(
            "weight",
            self.kernel_init or _torch_conv_default_init,
            (self.out_ch, self.in_ch, kh, kw),
        )
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        b = self.param("bias", bias_init, (self.out_ch,))
        return y + b.reshape(1, -1, 1, 1).astype(x.dtype)


def _sliding_max_1d(x, k: int, axis: int):
    """Stride-1 sliding max over a k-window along `axis` (valid positions only:
    output length L-k+1) via shift-doubling: max over window 2w = max of two
    w-windows offset by w, and any k in (w, 2w] = max of two w-windows offset by
    k-w (overlap is harmless for max). ceil(log2 k)(+1) pairwise maxima replace a
    k-tap reduce_window, and — the real win — the VJP is a chain of elementwise
    selects instead of a select_and_scatter."""

    def sl(a, start, length):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + length)
        return a[tuple(idx)]

    m, w = x, 1
    while 2 * w <= k:
        m = jnp.maximum(sl(m, 0, m.shape[axis] - w), sl(m, w, m.shape[axis] - w))
        w *= 2
    if w < k:
        d = k - w
        m = jnp.maximum(sl(m, 0, m.shape[axis] - d), sl(m, d, m.shape[axis] - d))
    return m


def max_pool2d(x, kernel=3, stride=(1, 2), padding=1, impl=None):
    """torch MaxPool2d(kernel, stride, padding) with -inf padding.

    impl "shift" (or the module default set via set_max_pool_impl) computes the
    stride-1 sliding max separably per axis with _sliding_max_1d and then
    subsamples — value-exact vs reduce_window (max is separable; -inf padding
    never wins). Gradient caveat: at EXACT ties inside a window, reduce_window's
    select_and_scatter routes the cotangent to one winner while the pairwise-max
    chain may split it across tied elements — a subgradient choice with no
    bearing on correctness (torch itself picks a different winner than XLA).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if impl is None:
        impl = _POOL_IMPL
    if impl == "shift":
        neg = np.asarray(-np.inf, x.dtype)
        xp = jnp.pad(
            x,
            ((0, 0), (0, 0), (padding, padding), (padding, padding)),
            constant_values=neg,
        )
        m = _sliding_max_1d(xp, kernel, axis=2)
        m = _sliding_max_1d(m, kernel, axis=3)
        return m[:, :, :: stride[0], :: stride[1]]
    if impl == "separable":
        # max is separable: one k-tap window per axis (2k taps instead of k^2,
        # and the VJP is two small select_and_scatters instead of one k^2-tap
        # one) — value-exact; -inf padding never wins a max. Gradient caveat at
        # exact ties as for "shift" (a different winner may be selected).
        neg = np.asarray(-np.inf, x.dtype)
        m = lax.reduce_window(
            x, neg, lax.max,
            window_dimensions=(1, 1, kernel, 1),
            window_strides=(1, 1, stride[0], 1),
            padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
        )
        return lax.reduce_window(
            m, neg, lax.max,
            window_dimensions=(1, 1, 1, kernel),
            window_strides=(1, 1, 1, stride[1]),
            padding=((0, 0), (0, 0), (0, 0), (padding, padding)),
        )
    return lax.reduce_window(
        x,
        np.asarray(-np.inf, x.dtype),  # concrete scalar in x's dtype (bf16-safe);
        lax.max,                       # a traced init breaks reduce_window's VJP
        window_dimensions=(1, 1, kernel, kernel),
        window_strides=(1, 1, *stride),
        padding=((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )


def unfold_neighbors(x, kernel_size, exclude_center=True):
    """torch F.unfold with zero padding: (B,C,H,W) -> (B,C,K[,-1],H*W) neighbor stacks,
    K = prod(kernel_size), center optionally removed (reference crf_as_rnn.py:69-79)."""
    kh, kw = kernel_size
    B, C, H, W = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    slabs = []
    for dy in range(kh):
        for dx in range(kw):
            if exclude_center and dy == ph and dx == pw:
                continue
            slabs.append(xp[:, :, dy : dy + H, dx : dx + W])
    out = jnp.stack(slabs, axis=2)  # (B,C,K,H,W)
    return out.reshape(B, C, out.shape[2], H * W)
