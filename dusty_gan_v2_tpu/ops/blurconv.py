"""Blur folded into the following strided conv (the dusty_v2 D hot path).

The discriminator's per-resblock chain is `... -> blur -> conv3x3 s2` on the main
path and `blur -> conv1x1 s2` on the skip (reference dusty_v2.py:325-345 via
ops.Resample/ops.Conv2d, gans/models/ops/common.py:45-210). Both ops are linear,
so in the interior they compose into ONE dense strided conv with kernel
`k = conv (*) outer(taps, taps)` (6x6 for the 3x3 main conv, 4x4 for the 1x1
skip) — one HBM read of the activation instead of three passes (blur W, blur H,
conv). Measured on v5e at training config (B=128 bf16, scripts/bench_dfuse.py):
the D resblock trunk falls from 48.6 ms to ~20 ms fwd+bwd; the standalone Pallas
act->resample chain fusion and the depthwise-conv blur both lose to this.

Boundary exactness (same strategy as ops/pad.py::conv_ring_fast): the composite
conv runs with fused zero padding; the circular-W wrap contributions are added
back as per-output-column correction einsums, and the few H-boundary output rows
whose replicate-pad semantics do NOT compose into any single conv (the conv's
replicate pad of the *blurred* tensor is not a linear extension of x) are
recomputed exactly through the original two-stage op on a thin row band (<= 7
rows) and overwrite the composite's rows. Equal to blur -> conv up to fp
reassociation (tests/test_blurconv.py: fwd + both grads vs the production pair).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

from .pad import _depthwise_conv_1d

__all__ = ["blur_conv3x3s2_ring", "blur_conv1x1s2_ring", "blur_conv_fusable"]

_NCHW = ("NCHW", "OIHW", "NCHW")


@functools.lru_cache(maxsize=None)
def _tap_matrix(window, k: int):
    """T[u, t] = taps[u - t] (0 outside): the banded compose matrix such that
    k_comp = sum_{t+a=u} w[t] * taps[a] = (T @ w) along one axis."""
    taps = np.asarray(window, np.float64)
    taps = taps / taps.sum()
    n = len(window)
    T = np.zeros((k + n - 1, k), np.float32)
    for u in range(k + n - 1):
        for t in range(k):
            if 0 <= u - t < n:
                T[u, t] = taps[u - t]
    return T


def _norm_taps(window, dtype):
    t = np.asarray(window, np.float64)
    return jnp.asarray(t / t.sum(), dtype)


def blur_conv_fusable(x_shape, kernel_size: int, stride, padding: int,
                      ring: bool, h_mode: str) -> bool:
    """Whether the blur->conv pair at this site composes into the fused op."""
    import os

    if os.environ.get("DUSTY_TPU_DISABLE_BLURCONV"):  # A/B kill switch
        return False
    H, W = x_shape[-2], x_shape[-1]
    s = stride if isinstance(stride, int) else stride[0]
    return (
        ring
        and h_mode == "replicate"
        and s == 2
        and ((kernel_size == 3 and padding == 1) or (kernel_size == 1 and padding == 0))
        and H % 2 == 0
        and W % 2 == 0
        and H >= 6
        and W >= 8
    )


def _place_col(d, oW: int, col: int):
    """(B,O,oH) -> (B,O,oH,oW) with the values at output column `col`."""
    zero = jnp.zeros((), d.dtype)
    return lax.pad(d[:, :, :, None], zero,
                   [(0, 0, 0), (0, 0, 0), (0, 0, 0), (col, oW - 1 - col, 0)])


def blur_conv3x3s2_ring(x: jnp.ndarray, w: jnp.ndarray,
                        window=(1, 3, 3, 1)) -> jnp.ndarray:
    """Exactly `conv_ring_fast(resample(x, blur_plan), w, (2,2))` in one strided
    6x6 conv + boundary corrections.

    x: (B, I, H, W); w: (O, I, 3, 3) already LR-scaled, any float dtype (the
    composite kernel is built in w's dtype, then cast to x's).
    Blur = 4-tap normalized FIR, circular-W pad (2,1) / replicate-H pad (2,1)
    (ResamplePlan semantics); conv = 3x3 stride 2, circular-W / replicate-H pad 1.

    COST MODEL (v5e, B=128 bf16, scripts/bench_dfuse.py + bench_train A/B): the
    composite trades HBM passes for 4x the conv FLOPs (36 vs 9 taps), so it wins
    where the chain is bandwidth-bound — forward + input-grad (D trunk fwd+dgrad
    48.7 -> 32.3 ms) — and LOSES where weight-grads are needed (full-step A/B:
    fused-everywhere 444 imgs/s vs unfused 515). Callers must gate it per phase:
    the trainer fuses the G-phase D (wgrads DCE'd) and keeps the D phase / R1 on
    the unfused pair. An asymmetric custom VJP (composite dx + 3x3-formulation
    dw on recomputed blur) was measured WORSE than fusing everywhere (413
    imgs/s: the re-linearized primal inside the bwd doesn't fully DCE) and was
    removed.
    """
    B, I, H, W = x.shape
    assert w.shape[-2:] == (3, 3) and len(window) == 4
    assert H % 2 == 0 and W % 2 == 0 and H >= 6 and W >= 8, (H, W)
    oH, oW = H // 2, W // 2
    T = jnp.asarray(_tap_matrix(tuple(float(v) for v in window), 3), w.dtype)
    k6 = jnp.einsum("oits,ut,vs->oiuv", w, T, T).astype(x.dtype)  # (O,I,6,6)

    # interior: output (o, v) reads x~[2o-3+u, 2v-3+c]; zero H/W pads fused
    y0 = lax.conv_general_dilated(x, k6, (2, 2), ((3, 2), (3, 2)),
                                  dimension_numbers=_NCHW)

    # circular-W wrap corrections (zero-H semantics; the H-boundary rows these
    # get wrong are overwritten by the band recomputes below):
    #   col 0 reads x~ cols -3..-1 = x[W-3..W-1] against kernel cols 0..2
    #   col 1 reads x~ col  -1     = x[W-1]      against kernel col  0
    #   col oW-1 reads x~ col W    = x[0]        against kernel col  5
    def col_corr(strip, ktaps):
        ext = lax.pad(strip, jnp.zeros((), strip.dtype),
                      [(0, 0, 0), (0, 0, 0), (3, 2, 0), (0, 0, 0)])
        sl = jnp.stack(
            [ext[:, :, u : u + 2 * (oH - 1) + 1 : 2] for u in range(6)], axis=2
        )  # (B, I, 6, oH, c)
        return jnp.einsum("oiuc,biunc->bon", ktaps, sl)

    corr = _place_col(col_corr(x[:, :, :, W - 3:], k6[:, :, :, 0:3]), oW, 0)
    corr = corr + _place_col(col_corr(x[:, :, :, W - 1:], k6[:, :, :, 0:1]), oW, 1)
    corr = corr + _place_col(col_corr(x[:, :, :, 0:1], k6[:, :, :, 5:6]), oW, oW - 1)
    ymid = y0 + corr

    # H-boundary rows, recomputed through the true two-stage op on thin bands.
    # Output rows 0/1 read the conv's replicate pad row b~[-1] = b[0] and blur
    # rows built from x's replicate pad; row oH-1 reads blur row b[H-1] built
    # from x~[H] = x[H-1].
    t4 = _norm_taps(window, x.dtype)
    wj = w.astype(x.dtype)

    def blur_valid(xb):
        xb = _depthwise_conv_1d(xb, t4, axis=-1)
        return _depthwise_conv_1d(xb, t4, axis=-2)

    def wrap_w(xb):  # attach blur(2,1)+conv(1,1) circular-W margin: cols -3..W+1
        return jnp.concatenate([xb[:, :, :, W - 3:], xb, xb[:, :, :, :2]], axis=3)

    xb = wrap_w(x[:, :, 0:5])
    xb = jnp.concatenate([xb[:, :, :1], xb[:, :, :1], xb], axis=2)  # 7 rows
    bb = blur_valid(xb)  # (B,I,4,W+2): b rows 0..3, cols -1..W
    bb = jnp.concatenate([bb[:, :, :1], bb], axis=2)  # b~[-1] = b[0]
    y_top = lax.conv_general_dilated(bb, wj, (2, 2), "VALID",
                                     dimension_numbers=_NCHW)  # (B,O,2,oW)

    xb = wrap_w(x[:, :, H - 5:])
    xb = jnp.concatenate([xb, xb[:, :, -1:]], axis=2)  # 6 rows (x~[H] = x[H-1])
    bb = blur_valid(xb)  # (B,I,3,W+2): b rows H-3..H-1
    y_bot = lax.conv_general_dilated(bb, wj, (2, 2), "VALID",
                                     dimension_numbers=_NCHW)  # (B,O,1,oW)

    return jnp.concatenate([y_top, ymid[:, :, 2 : oH - 1], y_bot], axis=2)


def blur_conv1x1s2_ring(x: jnp.ndarray, w: jnp.ndarray,
                        window=(1, 3, 3, 1)) -> jnp.ndarray:
    """Exactly `conv1x1_s2(resample(x, blur_plan))` (the resblock skip: no conv
    padding) in one strided 4x4 conv + boundary corrections.

    x: (B, I, H, W); w: (O, I, 1, 1) already LR-scaled. Output (o, v) reads
    blur[2o, 2v] = sum_{a,c} taps[a] taps[c] x~[2o-2+a, 2v-2+c]: only output
    row 0 touches the replicate-H pad (a pure extension here — there is no
    second-stage pad — so a replicate-extended band recompute is exact) and
    only output column 0 touches the W wrap.

    Same phase-gating cost model as blur_conv3x3s2_ring (4x4 composite = 16x
    the 1x1 weight-grad FLOPs): fuse only on dgrad-only paths.
    """
    B, I, H, W = x.shape
    assert w.shape[-2:] == (1, 1) and len(window) == 4
    assert H % 2 == 0 and W % 2 == 0 and H >= 6 and W >= 8, (H, W)
    oH, oW = H // 2, W // 2
    t4w = _norm_taps(window, w.dtype)
    k4 = jnp.einsum("oi,a,c->oiac", w[:, :, 0, 0], t4w, t4w).astype(x.dtype)

    y0 = lax.conv_general_dilated(x, k4, (2, 2), ((2, 0), (2, 0)),
                                  dimension_numbers=_NCHW)

    # W wrap: out col 0 reads x~ cols -2..-1 = x[W-2..W-1] against kernel cols 0..1
    ext = lax.pad(x[:, :, :, W - 2:], jnp.zeros((), x.dtype),
                  [(0, 0, 0), (0, 0, 0), (2, 0, 0), (0, 0, 0)])
    sl = jnp.stack(
        [ext[:, :, u : u + 2 * (oH - 1) + 1 : 2] for u in range(4)], axis=2
    )
    d0 = jnp.einsum("oiuc,biunc->bon", k4[:, :, :, 0:2], sl)
    ymid = y0 + _place_col(d0, oW, 0)

    # H top row: replicate-extend 2 rows (exact: single-stage op) + W wrap band
    xb = x[:, :, 0:2]
    xb = jnp.concatenate([xb[:, :, :, W - 2:], xb], axis=3)
    xb = jnp.concatenate([xb[:, :, :1], xb[:, :, :1], xb], axis=2)  # 4 rows
    y_top = lax.conv_general_dilated(xb, k4, (2, 2), "VALID",
                                     dimension_numbers=_NCHW)  # (B,O,1,oW)

    return jnp.concatenate([y_top, ymid[:, :, 1:]], axis=2)
