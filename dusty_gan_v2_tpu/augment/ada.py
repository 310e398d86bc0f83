"""Adaptive discriminator augmentation (StyleGAN2-ADA) for LiDAR range images.

Behavioral equivalent of reference `gans/augment/adaptive_augment.py:294-623` with a
TPU-native execution plan:

  * The reference computes *data-dependent* padding from the sampled affine matrices
    (get_padding, :271-291) — impossible under XLA's static shapes. Here the canvas is
    padded statically and the warp samples with **wrap indexing along W** (exact for the
    periodic azimuth axis — strictly more faithful to ring geometry than the reference's
    bounded circular pad + zero fill) and reflect-then-zero along H with the reference's
    own clamp ceiling (pad = H-1).
  * upfirdn2d (wavelet SYM6 2x up / 2x down around the warp) is a fused lhs-dilated
    depthwise conv (ops.upfirdn2d) instead of a CUDA kernel.
  * grid_sample becomes a gather-based bilinear warp; JAX differentiates it to any order
    (the reference needed a hand-written double-backward, :49-96).
  * The adaptive-p controller is a pure function over (p, sign_cum, n_pred_cum); the
    cross-device reduction is a jax.lax.psum when run under shard_map / pjit (the
    reference used dist.all_reduce, :36-46).

Parameter distributions, transform composition order, and the color-matrix math match
the reference exactly.
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops.pad import _pad_axis
from ..ops.shift import fractional_wrap_lerp
from ..ops.resample import upfirdn2d
from ..parallel.persample import PerSampleStream, global_ids

__all__ = ["AdaptiveAugment", "AdaState", "SYM2", "SYM6"]

# Daubechies symlet coefficients (public wavelet constants)
SYM2 = np.array(
    [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025]
)
SYM6 = np.array(
    [
        0.015404109327027373,
        0.0034907120842174702,
        -0.11799011114819057,
        -0.048311742585633,
        0.4910559419267466,
        0.787641141030194,
        0.3379294217276218,
        -0.07263752278646252,
        -0.021060292512300564,
        0.04472490177066578,
        0.0017677118642428036,
        -0.007800708325034148,
    ]
)


def _make_fbank() -> np.ndarray:
    """4-band wavelet filter bank for imgfilter (reference :347-366)."""
    Hz_lo = SYM2
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[
            :, :-1
        ]
        fbank = scipy.signal.convolve(fbank, [Hz_lo2])
        fbank[i, (fbank.shape[1] - Hz_hi2.size) // 2 : (fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
    return fbank.astype(np.float32)


class AdaState(NamedTuple):
    """Adaptive-p controller state (device arrays; lives in the train state)."""

    p: jnp.ndarray  # scalar
    sign_cum: jnp.ndarray  # scalar
    n_pred_cum: jnp.ndarray  # scalar

    @classmethod
    def create(cls, p_init: float = 0.0) -> "AdaState":
        # distinct arrays: aliased leaves break buffer donation in the train step
        return cls(
            p=jnp.full((), p_init, jnp.float32),
            sign_cum=jnp.zeros((), jnp.float32),
            n_pred_cum=jnp.zeros((), jnp.float32),
        )


def _t2d(tx, ty):
    B = tx.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
    m = m.at[:, 0, 2].set(tx)
    return m.at[:, 1, 2].set(ty)


def _s2d(sx, sy):
    B = sx.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
    m = m.at[:, 0, 0].set(sx)
    return m.at[:, 1, 1].set(sy)


def _t3d(tx, ty, tz):
    B = tx.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    m = m.at[:, 0, 3].set(tx)
    m = m.at[:, 1, 3].set(ty)
    return m.at[:, 2, 3].set(tz)


def _s3d(sx, sy, sz):
    B = sx.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    m = m.at[:, 0, 0].set(sx)
    m = m.at[:, 1, 1].set(sy)
    return m.at[:, 2, 2].set(sz)


_AXIS = (1 / math.sqrt(3),) * 3


def _luma_flip(i):
    a = jnp.asarray(_AXIS + (0.0,), jnp.float32)
    return jnp.eye(4) - 2.0 * jnp.outer(a, a)[None] * i[:, None, None]


def _saturation_mat(i):
    a = jnp.asarray(_AXIS + (0.0,), jnp.float32)
    aa = jnp.outer(a, a)[None]
    return aa + (jnp.eye(4)[None] - aa) * i[:, None, None]


def _rotate3d(theta):
    ux, uy, uz = _AXIS
    eye = jnp.eye(3)[None]
    cross = jnp.asarray(
        [[0, -uz, uy], [uz, 0, -ux], [-uy, ux, 0]], jnp.float32
    )[None]
    outer = jnp.outer(jnp.asarray(_AXIS), jnp.asarray(_AXIS))[None]
    s = jnp.sin(theta)[:, None, None]
    c = jnp.cos(theta)[:, None, None]
    rot = c * eye + s * cross + (1 - c) * outer
    out = jnp.tile(jnp.eye(4, dtype=jnp.float32), (theta.shape[0], 1, 1))
    return out.at[:, :3, :3].set(rot)


def _inv3x3(m):
    """Closed-form batched 3x3 inverse (adjugate/determinant): avoids the TPU
    lax.linalg custom call, fuses into the surrounding elementwise graph."""
    a, b, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    g, h, i = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[:, None, None]


@functools.lru_cache(maxsize=8)
def _warp_chain_mats(H: int, W: int):
    """Constant per-shape operators of the separable warp chain (see _geometric).

    Built once per (H, W) by pushing identity bases through the REAL ops
    (_pad_axis + upfirdn2d), so each matrix is exact-by-construction equal to the
    direct pipeline's corresponding pad/FIR stage:
      Uh (Hs, H): reflect pad (H-1 each side) -> 2x up-FIR along H (flipped SYM6)
      Dh (H, Ho): 2x down-FIR along H incl. the crop pads (Ho = warp canvas rows)
      Uw (Ws, W): circular pad -> 2x up-FIR along W (flipped SYM6), Ws = 2W exactly
      Dw (W, Wo): 2x down-FIR along W incl. the crop pads
    Indexing is [out, in]. Returned as numpy float32: jit traces embed them as
    compile-time constants (the eager construction happens once per shape).
    """
    with jax.ensure_compile_time_eval():
        return _warp_chain_mats_impl(H, W)


def _warp_chain_mats_impl(H: int, W: int):
    k = jnp.asarray(SYM6, jnp.float32)
    kl = len(SYM6)
    pad_k = kl // 4  # 3
    kc = jnp.flip(k)
    up0, up1 = (kl + 2 - 1) // 2, (kl - 2) // 2
    c = kl  # circular margin along W; the filter never sees a synthetic W edge
    d_p = -pad_k * 2
    dn0, dn1 = d_p + (kl - 2 + 1) // 2, d_p + (kl - 2) // 2
    Ho, Wo = (H + 2 * pad_k) * 2, (W + 2 * pad_k) * 2

    # H chains: basis vectors live along axis -2, responses read off axis -2
    eh = jnp.eye(H, dtype=jnp.float32)[None, None]  # (1, 1, H, H)
    xh = _pad_axis(eh, -2, H - 1, H - 1, "reflect")
    xh = upfirdn2d(xh, kc.reshape(-1, 1), up=(2, 1), pad=(0, 0, up0, up1))
    Uh = np.asarray(xh[0, 0])  # (Hs, H)
    eo = jnp.eye(Ho, dtype=jnp.float32)[None, None]
    xo = upfirdn2d(eo, k.reshape(-1, 1), down=(2, 1), pad=(0, 0, dn0, dn1))
    Dh = np.asarray(xo[0, 0])  # (H, Ho)

    # W chains: basis vectors along axis -2 rows, the op transforms axis -1
    ew = jnp.eye(W, dtype=jnp.float32)[None, None]  # (1, 1, W, W)
    xw = _pad_axis(ew, -1, c, c, "circular")
    xw = upfirdn2d(xw, kc.reshape(1, -1), up=(1, 2), pad=(up0 - 2 * c, up1 - 2 * c, 0, 0))
    Uw = np.asarray(xw[0, 0]).T  # (Ws, W)
    ewo = jnp.eye(Wo, dtype=jnp.float32)[None, None]
    xwo = upfirdn2d(ewo, k.reshape(1, -1), down=(1, 2), pad=(dn0, dn1, 0, 0))
    Dw = np.asarray(xwo[0, 0]).T  # (W, Wo)
    return Uh, Dh, Uw, Dw


def _maybe(st, p, mat, prev):
    """With prob p apply `mat`, else identity; compose onto prev (reference :248-253).
    `st` is a PerSampleStream (device-count-invariant per-sample draws)."""
    sel = (st.uniform((1, 1)) < p).astype(mat.dtype)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)[None]
    return (sel * mat + (1 - sel) * eye) @ prev


class AdaptiveAugment:
    """Stateless transform executor + pure-functional p controller.

    Usage:
        ada = AdaptiveAugment(policy=dict(lr_flip=1, ...), p_target=0.6, kimg=500)
        img_aug = ada(img, p, rng)                      # inside the jitted train step
        state = ada.cumulate(state, d_real_logits)       # inside train step (psum'd)
        state, rt = ada.update_p(state)                  # every `lazy.ada` steps
    """

    def __init__(
        self,
        p_init: float = 0.0,
        p_target: Optional[float] = 0.6,
        p_max: float = 0.9,
        kimg: float = 500,
        lr_flip=0.0,
        ud_flip=0.0,
        int_trans=0.0,
        iso_scale=0.0,
        frac_trans=0.0,
        brightness=0.0,
        contrast=0.0,
        luma_flip=0.0,
        hue=0.0,
        saturation=0.0,
        imgfilter=0.0,
        noise=0.0,
        cutout=0.0,
        wonly_trans: bool = False,
        **_unused,
    ):
        self.p_init = float(p_init)
        self.p_target = p_target
        self.p_max = float(p_max)
        self.kimg = float(kimg) * 1000.0
        self.mul = dict(
            lr_flip=float(lr_flip),
            ud_flip=float(ud_flip),
            int_trans=float(int_trans),
            iso_scale=float(iso_scale),
            frac_trans=float(frac_trans),
            brightness=float(brightness),
            contrast=float(contrast),
            luma_flip=float(luma_flip),
            hue=float(hue),
            saturation=float(saturation),
            imgfilter=float(imgfilter),
            noise=float(noise),
            cutout=float(cutout),
        )
        self.h_trans_factor = 0.0 if wonly_trans else 1.0
        self.Hz_fbank = jnp.asarray(_make_fbank())
        self.imgfilter_bands = (1.0, 1.0, 1.0, 1.0)
        self.imgfilter_std = 1.0

    def init_state(self) -> AdaState:
        return AdaState.create(self.p_init)

    # ----------------------------------------------------------------- p control
    @staticmethod
    def cumulate(state: AdaState, y_real: jnp.ndarray, axis_name=None) -> AdaState:
        """Accumulate sign(D(real)) statistics (reference :368-370). When called inside
        shard_map/pjit with an axis name, stats are psum'd over data shards."""
        s = jnp.sum(jnp.sign(jax.lax.stop_gradient(y_real)))
        n = jnp.asarray(y_real.shape[0] * 1.0)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            n = jax.lax.psum(n, axis_name)
        return state._replace(sign_cum=state.sign_cum + s, n_pred_cum=state.n_pred_cum + n)

    def update_p(self, state: AdaState) -> Tuple[AdaState, jnp.ndarray]:
        """Adjust p toward p_target by sign(rt - target) * n/kimg (reference :372-384)."""
        rt = state.sign_cum / jnp.maximum(state.n_pred_cum, 1.0)
        if self.p_target is not None:
            adjust = jnp.sign(rt - self.p_target) * state.n_pred_cum / self.kimg
            p = jnp.clip(state.p + adjust, 0.0, self.p_max)
        else:
            p = state.p
        z = jnp.zeros((), jnp.float32)
        return AdaState(p=p, sign_cum=z, n_pred_cum=z), rt

    # ----------------------------------------------------------------- transforms
    def sample_affine(self, st, B: int, height: int, width: int, p) -> jnp.ndarray:
        G = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
        ones = jnp.ones((B,), jnp.float32)
        if self.mul["lr_flip"] > 0:
            flip = st.randint().astype(jnp.float32)
            G = _maybe(st, p * self.mul["lr_flip"], _s2d(1 - 2 * flip, ones), G)
        if self.mul["ud_flip"] > 0:
            flip = st.randint().astype(jnp.float32)
            G = _maybe(st, p * self.mul["ud_flip"], _s2d(ones, 1 - 2 * flip), G)
        if self.mul["int_trans"] > 0:
            t = st.uniform((2,), minval=-0.125, maxval=0.125).T
            ty = jnp.round(t[0] * height) * self.h_trans_factor
            tx = jnp.round(t[1] * width)
            G = _maybe(st, p * self.mul["int_trans"], _t2d(tx, ty), G)
        if self.mul["iso_scale"] > 0:
            s = jnp.exp(st.normal() * (0.2 * math.log(2.0)))
            G = _maybe(st, p * self.mul["iso_scale"], _s2d(ones, s), G)
        if self.mul["frac_trans"] > 0:
            t = st.normal((2,)).T * 0.125
            ty = t[0] * height * self.h_trans_factor
            tx = t[1] * width
            G = _maybe(st, p * self.mul["frac_trans"], _t2d(tx, ty), G)
        return G

    def sample_color(self, st, B: int, p) -> jnp.ndarray:
        C = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
        if self.mul["brightness"] > 0:
            b = st.normal() * 0.2
            C = _maybe(st, p * self.mul["brightness"], _t3d(b, b, b), C)
        if self.mul["contrast"] > 0:
            c = jnp.exp(st.normal() * (0.5 * math.log(2.0)))
            C = _maybe(st, p * self.mul["contrast"], _s3d(c, c, c), C)
        if self.mul["luma_flip"] > 0:
            f = st.randint().astype(jnp.float32)
            C = _maybe(st, p * self.mul["luma_flip"], _luma_flip(f), C)
        if self.mul["hue"] > 0:
            theta = st.uniform(minval=-math.pi, maxval=math.pi)
            C = _maybe(st, p * self.mul["hue"], _rotate3d(theta), C)
        if self.mul["saturation"] > 0:
            s = jnp.exp(st.normal() * math.log(2.0))
            C = _maybe(st, p * self.mul["saturation"], _saturation_mat(s), C)
        return C

    # ----------------------------------------------------------------- warp
    def _geometric(self, img: jnp.ndarray, G: jnp.ndarray) -> jnp.ndarray:
        """2x wavelet upsample -> inverse-affine bilinear warp (wrap W / reflect+zero H)
        -> 2x wavelet downsample. Static shapes throughout.

        PERF (r3): every stage of this chain is LINEAR in the image and factorizes
        per axis, so it is executed in composed-operator form instead of on 2x/3x-size
        image intermediates:
          * the whole H-axis chain (reflect pad -> up-FIR -> bilinear row warp ->
            down-FIR) collapses into ONE per-sample (H, H) matrix `Ah` built from two
            row-gathers of the constant up operator and one small matmul with the
            constant down operator — applied to the image first as a batched einsum;
          * the W-axis chain then runs on H-row tensors (never the 3H-2-row reflect
            apron): constant up-FIR matmul (W -> 2W), fractional wrap gather + lerp,
            constant down-FIR matmul (2W+taps -> W).
        The old direct pipeline materialized (B, Wo, Ws)/(B, Ho, Hs) one-hot warp
        matrices (272 MB at B=64 — larger than the images) and four upfirdn passes
        over up-to-(3H-2)x2W intermediates; measured ~8.6 ms at B=32 f32 on v5e.
        The composed form is the same linear map (exact up to fp reassociation).
        """
        B, C, H, W = img.shape
        kl = len(SYM6)
        pad_k = kl // 4  # 3
        Uh, Dh, Uw, Dw = _warp_chain_mats(H, W)
        Hs, Ws = Uh.shape[0], Uw.shape[0]
        assert Ws == 2 * W, (Ws, W)

        # affine bookkeeping in centered original-pixel coordinates, then conjugations
        # for padding / upsampling / normalization — same algebra as reference :484-523.
        G_inv = _inv3x3(G)
        # symmetric static pad: no origin shift needed for W (wrapped); H pad symmetric
        S2 = jnp.diag(jnp.asarray([2.0, 2.0, 1.0]))
        S2i = jnp.diag(jnp.asarray([0.5, 0.5, 1.0]))
        Thalf = jnp.asarray([[1, 0, -0.5], [0, 1, -0.5], [0, 0, 1]], jnp.float32)
        Thalf_i = jnp.asarray([[1, 0, 0.5], [0, 1, 0.5], [0, 0, 1]], jnp.float32)
        G_inv = S2[None] @ G_inv @ S2i[None]
        G_inv = Thalf[None] @ G_inv @ Thalf_i[None]

        # output canvas (same as reference): 2*(H+2*pad_k) x 2*(W+2*pad_k)
        Ho, Wo = (H + 2 * pad_k) * 2, (W + 2 * pad_k) * 2
        # normalized-coordinate conjugation
        Sn = jnp.diag(jnp.asarray([2.0 / Ws, 2.0 / Hs, 1.0]))
        Sni = jnp.diag(jnp.asarray([Wo / 2.0, Ho / 2.0, 1.0]))
        Gn = Sn[None] @ G_inv @ Sni[None]

        # The implemented policy (flips / translations / scale) composes to
        # axis-aligned affines (no rotation/shear terms exist in sample_affine), so the
        # warp factorizes into independent W and H resamplings. These are executed as
        # per-sample one-hot matmuls on the MXU — far faster on TPU than a 2-D gather.
        xt = (2.0 * jnp.arange(Wo) + 1.0) / Wo - 1.0
        yt = (2.0 * jnp.arange(Ho) + 1.0) / Ho - 1.0
        u = ((Gn[:, 0, 0, None] * xt[None] + Gn[:, 0, 2, None] + 1.0) * Ws - 1.0) / 2.0
        v = ((Gn[:, 1, 1, None] * yt[None] + Gn[:, 1, 2, None] + 1.0) * Hs - 1.0) / 2.0
        dtype = img.dtype

        # composed per-sample H operator: Ah = Dh @ [bilinear row mix of Uh rows]
        # (grid_sample zeros semantics outside [0, Hs) — same masks as the old Th)
        v0 = jnp.floor(v)
        fv = v - v0
        v0i = v0.astype(jnp.int32)
        v1i = v0i + 1
        w0 = (1.0 - fv) * ((v0i >= 0) & (v0i < Hs)).astype(v.dtype)
        w1 = fv * ((v1i >= 0) & (v1i < Hs)).astype(v.dtype)
        r0 = jnp.take(Uh, jnp.clip(v0i, 0, Hs - 1), axis=0)  # (B, Ho, H)
        r1 = jnp.take(Uh, jnp.clip(v1i, 0, Hs - 1), axis=0)
        M = r0 * w0[..., None] + r1 * w1[..., None]  # (B, Ho, H): warped up-chain
        Ah = jnp.einsum(
            "oh,bhi->boi", Dh, M, preferred_element_type=jnp.float32
        )  # (B, H, H)
        img = jnp.einsum(
            "boi,bciw->bcow", Ah.astype(dtype), img,
            preferred_element_type=jnp.float32,
        ).astype(dtype)

        # W chain on H-row tensors: up-FIR matmul -> fractional wrap gather -> down-FIR
        y = jnp.einsum(
            "bchw,sw->bchs", img, Uw.astype(dtype), preferred_element_type=jnp.float32
        ).astype(dtype)  # (B, C, H, Ws)
        u0 = jnp.floor(u)
        fu = (u - u0).astype(dtype)[:, None, None, :]
        i0 = jnp.mod(u0.astype(jnp.int32), Ws)
        # per-sample fractional wrap via the one-hot MXU matmul (ops/shift.py):
        # a batched gather's VJP is a scatter-add, the TPU slow path; bit-exact
        z = fractional_wrap_lerp(y, i0, fu)  # (B, C, H, Wo)
        img = jnp.einsum(
            "bchq,wq->bchw", z, Dw.astype(dtype), preferred_element_type=jnp.float32
        ).astype(dtype)
        assert img.shape[-2:] == (H, W), img.shape
        return img

    def __call__(self, img: jnp.ndarray, p: jnp.ndarray, rng, ids=None) -> jnp.ndarray:
        """Augment a batch (NCHW, float32). `p` is the adaptive strength scalar.

        All parameter draws are per-sample, keyed by global sample id (persample.py):
        augmenting a global batch gives the same result on any mesh size. `ids`
        overrides the id vector for batches whose rows are not the shard's
        natural [k*B, (k+1)*B) range (e.g. the trainer's reals++fakes concat).
        """
        B, C, H, W = img.shape
        if ids is None:
            ids = global_ids(B)
        st = PerSampleStream(rng, ids)

        G = self.sample_affine(st, B, H, W, p)
        img = self._geometric(img, G)

        # color transform (4x4 homogeneous; 1-channel projection for range images,
        # reference :537-545)
        Cmat = self.sample_color(st, B, p)
        flat = img.reshape(B, C, H * W)
        if C == 3:
            flat = Cmat[:, :3, :3] @ flat + Cmat[:, :3, 3:]
        elif C == 1:
            Cm = jnp.mean(Cmat[:, :3, :], axis=1, keepdims=True)  # (B,1,4)
            flat = flat * jnp.sum(Cm[:, :, :3], axis=2, keepdims=True) + Cm[:, :, 3:]
        img = flat.reshape(B, C, H, W)

        if self.mul["imgfilter"] > 0:
            img = apply_imgfilter(img, self.imgfilter_gains(p, st))

        if self.mul["noise"] > 0:
            sigma = jnp.abs(st.normal((1, 1, 1))) * 0.1
            on = st.uniform((1, 1, 1)) < self.mul["noise"] * p
            sigma = jnp.where(on, sigma, 0.0)
            img = img + st.normal(img.shape[1:]) * sigma

        if self.mul["cutout"] > 0:
            size = jnp.full((B, 2, 1, 1, 1), 0.5)
            on = st.uniform((1, 1, 1, 1)) < self.mul["cutout"] * p
            size = jnp.where(on, size, 0.0)
            center = st.uniform((2, 1, 1, 1))
            img = img * cutout_mask(center, size, H, W).astype(img.dtype)

        return img

    def imgfilter_gains(self, p, st):
        """Per-sample combined amplification filter Hz' (B, taps): per-band log-normal
        gains with 1/f power normalization (reference :556-584)."""
        num_bands = self.Hz_fbank.shape[0]
        B = st.keys.shape[0]
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
        g = jnp.ones((B, num_bands))
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(st.normal() * self.imgfilter_std)
            on = st.uniform() < self.mul["imgfilter"] * p * band_strength
            t_i = jnp.where(on, t_i, 1.0)
            t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * t**2, axis=-1, keepdims=True))
            g = g * t
        return g @ self.Hz_fbank  # (B, taps)


def apply_imgfilter(img: jnp.ndarray, Hz_prime: jnp.ndarray) -> jnp.ndarray:
    """Separable per-sample FIR filter, circular-W / reflect-H padded
    (reference :585-595 grouped convs)."""
    B, C, H, W = img.shape
    taps = Hz_prime.shape[-1]
    pp = taps // 2
    x = _pad_axis(img, -1, pp, pp, "circular")
    x = _pad_axis(x, -2, pp, pp, "reflect")

    # separable per-sample filter via batched depthwise conv (vmap over batch)
    def one(xi, ki):
        kern_w = jnp.broadcast_to(ki.reshape(1, 1, 1, taps), (C, 1, 1, taps))
        kern_h = jnp.broadcast_to(ki.reshape(1, 1, taps, 1), (C, 1, taps, 1))
        y = jax.lax.conv_general_dilated(
            xi[None], kern_w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        )
        y = jax.lax.conv_general_dilated(
            y, kern_h, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        )
        return y[0]

    return jax.vmap(one)(x, Hz_prime.astype(img.dtype))


def cutout_mask(center: jnp.ndarray, size: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B,1,H,W) keep-mask for rectangular cutout (reference :609-620):
    center/size in normalized [0,1] coords, shapes (B,2,1,1,1)."""
    cx = jnp.arange(W).reshape(1, 1, 1, -1)
    cy = jnp.arange(H).reshape(1, 1, -1, 1)
    mx = jnp.abs((cx + 0.5) / W - center[:, 0]) >= size[:, 0] / 2
    my = jnp.abs((cy + 0.5) / H - center[:, 1]) >= size[:, 1] / 2
    return (mx | my)


def _warp_separable(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Axis-aligned bilinear warp as two batched one-hot matmuls (MXU path).

    img (B,C,Hs,Ws); u (B,Wo) source x per output column (wrap); v (B,Ho) source y per
    output row (zeros outside). Matches grid_sample(bilinear, zeros, align_corners=False)
    semantics except W wraps (ring images).
    """
    B, C, Hs, Ws = img.shape
    Wo = u.shape[1]
    Ho = v.shape[1]
    dtype = img.dtype

    u0 = jnp.floor(u)
    fu = (u - u0).astype(dtype)
    i0 = jnp.mod(u0.astype(jnp.int32), Ws)
    i1 = jnp.mod(u0.astype(jnp.int32) + 1, Ws)
    iota_w = jnp.arange(Ws, dtype=jnp.int32)
    Sw = (iota_w[None, None, :] == i0[:, :, None]).astype(dtype) * (1 - fu)[:, :, None]
    Sw = Sw + (iota_w[None, None, :] == i1[:, :, None]).astype(dtype) * fu[:, :, None]

    v0 = jnp.floor(v)
    fv = (v - v0).astype(dtype)
    v0i = v0.astype(jnp.int32)
    v1i = v0i + 1
    w0 = (1 - fv) * ((v0i >= 0) & (v0i < Hs)).astype(dtype)
    w1 = fv * ((v1i >= 0) & (v1i < Hs)).astype(dtype)
    v0c = jnp.clip(v0i, 0, Hs - 1)
    v1c = jnp.clip(v1i, 0, Hs - 1)
    iota_h = jnp.arange(Hs, dtype=jnp.int32)
    Th = (iota_h[None, None, :] == v0c[:, :, None]).astype(dtype) * w0[:, :, None]
    Th = Th + (iota_h[None, None, :] == v1c[:, :, None]).astype(dtype) * w1[:, :, None]

    out = jnp.einsum("bchs,bos->bcho", img, Sw, preferred_element_type=jnp.float32)
    out = jnp.einsum("bcho,bih->bcio", out, Th, preferred_element_type=jnp.float32)
    return out.astype(dtype)


