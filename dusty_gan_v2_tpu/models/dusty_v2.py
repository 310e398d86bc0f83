"""DUSty v2 (WACV'23): StyleGAN2-style generator of LiDAR range images as neural fields
over laser angles, plus a StyleGAN2-residual discriminator.

Behavioral equivalent of reference `gans/models/dusty_v2.py` with these TPU-native
choices:
  - every modulated conv is a per-sample 1x1 matmul (einsum on the MXU), not a grouped
    conv trick;
  - resampling is a fused lhs-dilated depthwise conv (ops/resample.py), not upfirdn2d;
  - the subgrid-consistency inverse shift (reference dusty_v2.py:291-297's circular-cat +
    grid_sample) is a fractional circular roll implemented with two gathers + lerp;
  - mixed precision is a bfloat16 policy (params fp32, per-block compute dtype), not
    fp16 autocast + GradScaler.

Reference anchors: MappingNetwork dusty_v2.py:13-29, Head :32-57, SynthesisBlock
:60-183, SynthesisNetwork :186-308, Generator :311-322, ResidualBlock :325-345,
Discriminator :348-396.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    EqualLRDense,
    FourierFeature,
    FusedLeakyReLU,
    ModConv2d,
    NoiseInjection,
    RingConv2d,
    fourier_out_ch,
    make_resample,
    minibatch_stddev,
    resample,
    resample_sumsq,
)
from ..parallel.persample import global_ids, ps_uniform
from .base import GeneratorMixin
from .dusty_v1 import apply_raydrop
from .heads import resolve_act

__all__ = [
    "MappingNetwork",
    "SynthesisNetwork",
    "Generator",
    "Discriminator",
    "circular_translate_w",
]


class MappingNetwork(nn.Module):
    """PixelNorm + depth x (equal-LR Linear(lr_mul=0.01, gain=sqrt2) + LeakyReLU 0.2)."""

    in_ch: int
    out_ch: int
    depth: int = 2

    @nn.compact
    def __call__(self, z):
        from ..ops import pixel_norm

        h = pixel_norm(z, axis=1)
        ch = self.in_ch
        for i in range(self.depth):
            h = EqualLRDense(
                in_features=ch,
                features=self.out_ch,
                gain=math.sqrt(2.0),
                lr_mul=0.01,
                name=f"fc{i}",
            )(h)
            h = jnp.where(h >= 0, h, 0.2 * h)
            ch = self.out_ch
        return h


class Head(nn.Module):
    """Multi-head 1x1 ModConv (demod=False, ema=True) — StyleGAN2 ToRGB analogue."""

    in_ch: int
    mod_ch: int
    out_ch: Tuple[dict, ...]

    @nn.compact
    def __call__(self, x, style, train: bool = False) -> Dict[str, jnp.ndarray]:
        # the per-head modconvs share the input x, so their per-sample (B, ch, mid)
        # weights are stacked and applied as ONE einsum (x is read once instead of
        # once per head); params/stats stay per-head for checkpoint parity
        outs = [o for o in self.out_ch if o["ch"] > 0]
        wbs, bs = [], []
        for o in outs:
            wb, b = ModConv2d(
                in_ch=self.in_ch,
                out_ch=o["ch"],
                mod_ch=self.mod_ch,
                ksize=1,
                stride=1,
                padding=0,
                demod=False,
                ema=True,
                name=o["name"],
            )(x, style, train=train, return_weights=True)
            wbs.append(wb)
            bs.append(b if b is not None else jnp.zeros((o["ch"],), jnp.float32))
        wcat = jnp.concatenate(wbs, axis=1)
        y = jnp.einsum(
            "boi,bihw->bohw", wcat, x, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        y = y + jnp.concatenate(bs).reshape(1, -1, 1, 1).astype(x.dtype)
        out, c0 = {}, 0
        for o in outs:
            out[o["name"]] = y[:, c0 : c0 + o["ch"]]
            c0 += o["ch"]
        return out


def circular_translate_w(x: jnp.ndarray, delta: jnp.ndarray, impl=None) -> jnp.ndarray:
    """Fractional circular shift along W: out[..., i] = lerp(x[i+floor(d)], x[i+floor(d)+1]).

    Exactly reproduces the reference's circular-cat + bilinear grid_sample inverse shift
    (dusty_v2.py:291-297) for horizontal-only translations.
    x: (B, C, H, W); delta: (B,) shift in pixels.

    Default impl routes the per-sample gather through a one-hot MXU matmul
    (ops/shift.py: gather VJPs are scatter-adds, the TPU slow path); here the
    circulant structure (idx0[o+1] = idx0[o]+1) additionally recovers the +1
    neighbor as a STATIC roll of the matmul output, so one selection serves
    both lerp taps. Bit-exact vs the gather form.
    """
    from ..ops.shift import _SHIFT_IMPL, gather_cols_mm

    W = x.shape[-1]
    i0 = jnp.floor(delta)
    frac = (delta - i0)[:, None, None, None].astype(x.dtype)
    i0 = i0.astype(jnp.int32)
    base = jnp.arange(W, dtype=jnp.int32)[None]  # (1, W)
    idx0 = (base + i0[:, None]) % W  # (B, W)
    if (impl or _SHIFT_IMPL) == "matmul":
        g0 = gather_cols_mm(x, idx0)
        g1 = jnp.roll(g0, -1, axis=-1)  # x[idx0[o]+1 mod W] == g0[(o+1) mod W]
    else:
        idx1 = (idx0 + 1) % W
        g0 = jnp.take_along_axis(x, idx0[:, None, None, :], axis=-1)
        g1 = jnp.take_along_axis(x, idx1[:, None, None, :], axis=-1)
    return g0 * (1 - frac) + g1 * frac


class SynthesisBlock(nn.Module):
    """One scale: resample-up -> Fourier-PE concat -> 1-2 modulated 1x1 convs (+noise,
    fused leaky ReLU) -> multi-head skip accumulation (reference dusty_v2.py:60-183)."""

    in_ch: int  # 0 for the first block
    mid_ch: int
    out_ch: Tuple[dict, ...]
    mod_ch: int
    resolution: Tuple[int, int]
    up: int = 2
    resample_window: Tuple[float, ...] = (1, 3, 3, 1)
    use_noise: bool = True
    use_pe: bool = True
    pe_type: str = "random"
    pe_ch: int = 512
    pe_scale_offset: Tuple[int, int] = (3, -1)
    ring: bool = True
    dtype: str = "float32"

    @property
    def is_first(self) -> bool:
        return self.in_ch == 0

    @property
    def num_conv(self) -> int:
        return 1 if self.is_first else 2

    @nn.compact
    def __call__(
        self,
        h: Optional[jnp.ndarray],
        skip: Optional[Dict[str, jnp.ndarray]],
        ws: Tuple[jnp.ndarray, ...],
        angle: jnp.ndarray,
        train: bool = False,
        fixed_noise: Optional[Sequence] = None,
        azim_shift=None,
        pe_entry: Optional[jnp.ndarray] = None,
        *,
        return_pe_cache: bool = False,
    ):
        dtype = jnp.dtype(self.dtype)
        if return_pe_cache:
            # cache-builder pass (SynthesisNetwork return_pe_cache): produce this
            # block's PE volume at the block's own compute dtype, so feeding it
            # back via pe_entry is BIT-identical to the in-call computation
            assert self.use_pe
            return FourierFeature(
                resolution=tuple(self.resolution),
                basis_scale=self.pe_type,
                num_freqs=self.pe_ch,
                L_offset=tuple(self.pe_scale_offset),
                name="pe",
            )(angle.astype(dtype))
        ws = iter(ws)
        up_plan = (
            make_resample(
                up=self.up, window=self.resample_window, ring=self.ring, direction="hw"
            )
            if self.up > 1
            else None
        )

        conv1_x_op = None
        conv1_x_stat = None
        if h is not None:
            h = h.astype(dtype)
            if up_plan is not None:
                # the 1x1 contraction commutes with the (linear, per-channel)
                # resample — contract at the LOW resolution (4x fewer pixels,
                # mid_ch <= in_ch channels resampled). The ema_var statistic is
                # taken on the RESAMPLED input (reference style.py:98-103 on the
                # conv1 input); in train mode it is computed at the low resolution
                # via the resample's Gram factors (resample_sumsq, exact up to fp
                # reassociation) — r2 kept the reference op order in train solely
                # for this statistic, paying the hi-res contraction 3x per adv step
                conv1_x_op = lambda y: resample(y, up_plan)
                if train:
                    conv1_x_stat = resample_sumsq(h, up_plan)
        if self.use_pe:
            pe_in = fourier_out_ch(
                self.pe_ch, self.pe_type, self.resolution, self.pe_scale_offset
            )
            # PERF: the PE stays at the batch of `angle` (typically 1) in BOTH modes:
            # conv1 consumes it via ModConv2d's shared-input split contraction (the
            # (B, in+pe, H, W) concat is never materialized — see BASELINE.md), and
            # the train-time azimuth shift (aug_coords) enters as a per-sample
            # rotation of conv1's PE weight columns instead of a per-sample volume.
            ff = FourierFeature(
                resolution=tuple(self.resolution),
                basis_scale=self.pe_type,
                num_freqs=self.pe_ch,
                L_offset=tuple(self.pe_scale_offset),
                name="pe",
            )
            # pe_entry (from a prior return_pe_cache pass over the same fixed
            # angle grid) skips the einsum+sin/cos volume; rotation coefficients
            # still come from the frozen freqs (they depend on azim_shift only)
            pe_arg = angle.astype(dtype) if pe_entry is None else None
            pre = None if pe_entry is None else pe_entry.astype(dtype)
            if azim_shift is not None:
                h_pe, pe_rot = ff(
                    pe_arg, azim_shift=azim_shift, as_rotation=True, precomputed=pre
                )
            else:
                h_pe, pe_rot = ff(pe_arg, precomputed=pre), None
        else:
            pe_in, h_pe, pe_rot = 0, None, None

        def noise_rng(i):
            if fixed_noise is not None:
                return None
            return self.make_rng("noise")

        w0 = next(ws)
        h = ModConv2d(
            in_ch=self.in_ch + pe_in,
            out_ch=self.mid_ch,
            mod_ch=self.mod_ch,
            ksize=1,
            stride=1,
            padding=0,
            use_bias=False,
            ema=True,
            name="conv1",
        )(h, w0, train=train, x_shared=h_pe, shared_rotation=pe_rot,
          x_op=conv1_x_op, x_stat=conv1_x_stat)
        if self.use_noise:
            h = NoiseInjection(name="noise1")(
                h,
                rng=noise_rng(0),
                fixed_noise=None if fixed_noise is None else fixed_noise[0],
            )
        h = FusedLeakyReLU(self.mid_ch, name="bias_act1")(h)

        if not self.is_first:
            h = ModConv2d(
                in_ch=self.mid_ch,
                out_ch=self.mid_ch,
                mod_ch=self.mod_ch,
                ksize=1,
                stride=1,
                padding=0,
                use_bias=False,
                ema=True,
                name="conv2",
            )(h, next(ws), train=train)
            if self.use_noise:
                h = NoiseInjection(name="noise2")(
                    h,
                    rng=noise_rng(1),
                    fixed_noise=None if fixed_noise is None else fixed_noise[1],
                )
            h = FusedLeakyReLU(self.mid_ch, name="bias_act2")(h)

        o = Head(self.mid_ch, self.mod_ch, tuple(self.out_ch), name="head")(
            h, next(ws), train=train
        )

        # skip accumulation in float32 (reference dusty_v2.py:174-178). The heads are
        # stacked into ONE (B, sum(ch), H, W) tensor so each block runs a single
        # skip resample (resampling is per-channel independent, so this is exact).
        o_stack = jnp.concatenate(
            [o[c["name"]].astype(jnp.float32) for c in self.out_ch if c["ch"] > 0],
            axis=1,
        )
        if skip is not None:
            o_stack = o_stack + resample(skip, up_plan)
        return h, o_stack


def downsample_angle(angle: jnp.ndarray, plan) -> jnp.ndarray:
    """Downsample an angle grid by resampling its (sin, cos) embedding then atan2
    (reference dusty_v2.py:135-140) — keeps azimuth periodicity exact."""
    C = angle.shape[1]
    periodic = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=1)
    periodic = resample(periodic, plan)
    return jnp.arctan2(periodic[:, :C], periodic[:, C:])


class SynthesisNetwork(nn.Module):
    """5-block skip-accumulating synthesis over a multiscale angle pyramid
    (reference dusty_v2.py:186-308)."""

    in_ch: int
    out_ch: Tuple[dict, ...]
    ch_base: int = 64
    ch_max: int = 512
    resolution: Tuple[int, int] = (64, 256)
    ring: bool = True
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    num_fp16_layers: int = -1  # on TPU: number of trailing blocks run in bfloat16
    use_noise: bool = True
    pe_type: str = "random"
    pe_scale_offset: Tuple[int, int] = (3, -1)
    aug_coords: bool = True
    aug_coords_blitting: bool = False
    output_scale: float = 0.25
    compute_dtype: str = "float32"  # "bfloat16" enables the mixed-precision path
    remat: bool = False  # rematerialize each block's activations (trade FLOPs for HBM;
    # enables large-batch training, cf. the B=128 full-step HBM ceiling in BASELINE.md)

    @property
    def num_blocks(self) -> int:
        return len(self.layers) + 1

    @property
    def num_styles(self) -> int:
        return self.num_blocks * 2

    def block_dtypes(self):
        """Per-block compute dtype; the reference's per-layer fp16 flags (fp16 applied to
        the last `num_fp16_layers` blocks, or all when -1) mapped to bfloat16."""
        n = self.num_blocks
        out = []
        for i in range(n):
            i_rev = n - 1 - i
            use_low = (
                self.compute_dtype == "bfloat16"
                and (self.num_fp16_layers == -1 or i_rev < self.num_fp16_layers)
            )
            out.append("bfloat16" if use_low else "float32")
        return out

    def _angle_pyramid(self, angle, scales):
        down_plan = make_resample(down=2, window=(1, 3, 3, 1), ring=self.ring)
        pyramid = [angle]
        for s in scales[:0:-1]:
            if s > 1:
                angle = downsample_angle(angle, down_plan)
            pyramid.insert(0, angle)
        return pyramid

    def _block_kwargs(self, i, s, res_i, dtypes, ch):
        """SINGLE source of truth for per-block construction: used by both the
        main forward loop and the pe_cache builder pass, so the two can never
        desynchronize on kwargs or the use_pe gating."""
        return dict(
            in_ch=ch(i - 1) if i != 0 else 0,
            mid_ch=ch(i),
            out_ch=tuple(self.out_ch),
            mod_ch=self.in_ch,
            resolution=(int(res_i[0]), int(res_i[1])),
            up=s,
            use_noise=self.use_noise,
            use_pe=s > 1 or i == 0,
            pe_type=self.pe_type,
            pe_scale_offset=tuple(self.pe_scale_offset),
            ring=self.ring,
            dtype=dtypes[i],
        )

    def _pe_cache_pass(self, angle, scales, ch):
        """Build the per-block PE volumes once for a fixed angle grid (feed the
        result back as `pe_cache` to skip the pyramid + sin/cos work per call).
        Bit-identical to the in-call computation: same block dtypes, same math."""
        pyramid = self._angle_pyramid(angle, scales)
        dtypes = self.block_dtypes()
        H, W = self.resolution
        res_i = np.array([H, W]) // int(np.prod(self.layers))
        out = []
        for i, s in enumerate(scales):
            res_i = res_i * s
            kw = self._block_kwargs(i, s, res_i, dtypes, ch)
            if not kw["use_pe"]:
                out.append(None)
                continue
            blk = SynthesisBlock(**kw, name=f"b{i}")
            out.append(blk(None, None, None, pyramid[i], return_pe_cache=True))
        return out

    @nn.compact
    def __call__(
        self,
        ws: jnp.ndarray,
        angle: jnp.ndarray,
        train: bool = False,
        fixed_noise=None,
        pe_cache=None,
        return_pe_cache: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        H, W = self.resolution
        scales = (1,) + tuple(self.layers)
        n_layers = len(scales)
        ch = lambda i: min(self.ch_base << (len(self.layers) - i), self.ch_max)

        if return_pe_cache:
            return tuple(self._pe_cache_pass(angle, scales, ch))
        if pe_cache is None:
            pe_cache = (None,) * len(scales)
        B, N, _ = ws.shape
        assert N == self.num_styles, f"{self.num_styles} != {N}"

        do_aug = train and self.aug_coords
        azim_shift = None
        if do_aug:
            # random horizontal angle shift for subgrid consistency
            # (reference dusty_v2.py:264-274). PERF: the shift is applied inside the
            # Fourier encoding via an exact trig identity, so the base angle pyramid and
            # sin/cos volumes stay batch-1 (shifting the azimuth commutes with the
            # sin/cos pyramid downsampling exactly: integer +-2^k W-frequencies).
            shift01 = ps_uniform(self.make_rng("aug"), global_ids(B))
            if self.aug_coords_blitting:
                shift01 = jnp.round(shift01 * W) / W
            shift = shift01 * (2.0 * np.pi)
            azim_shift = shift

        # multiscale angle pyramid (top-down repeated sin/cos downsampling).
        # With a pe_cache (PE volumes are pure constants of the fixed sensor
        # grid) the pyramid is never consumed — angle feeds only the PE.
        have_cache = any(p is not None for p in pe_cache)
        if have_cache:
            pyramid = [None] * n_layers
        else:
            pyramid = self._angle_pyramid(angle, scales)

        dtypes = self.block_dtypes()
        res_i = np.array([H, W]) // int(np.prod(self.layers))
        h, skip, wi = None, None, 0
        # __call__(self, h, skip, ws, angle, train, fixed_noise, azim_shift):
        # `train` (positional 5) is a python bool -> static under remat
        blk_cls = (
            nn.checkpoint(SynthesisBlock, static_argnums=(5,))
            if self.remat
            else SynthesisBlock
        )
        for i, s in enumerate(scales):
            res_i = res_i * s
            blk = blk_cls(**self._block_kwargs(i, s, res_i, dtypes, ch),
                          name=f"b{i}")
            fn = None if fixed_noise is None else fixed_noise[i]
            h, skip = blk(
                h, skip, (ws[:, wi], ws[:, wi + 1], ws[:, wi + 2]), pyramid[i],
                train, fn, azim_shift, pe_cache[i],
            )
            wi += 1 if i == 0 else 2  # blk.num_conv (wrapped class hides properties)

        if do_aug:
            # cancel the angular shift in image space: translate by +shift/(2pi)*W px
            delta = shift / (2.0 * np.pi) * W
            skip = circular_translate_w(skip, delta)

        out = {}
        c0 = 0
        for o in self.out_ch:
            if o["ch"] == 0:
                continue
            k = o["name"]
            out[k] = resolve_act(o.get("act"))(
                skip[:, c0 : c0 + o["ch"]] * self.output_scale
            )
            c0 += o["ch"]
        return out


class Generator(nn.Module, GeneratorMixin):
    """Mapping + synthesis + ray-drop measurement (reference dusty_v2.py:311-322)."""

    mapping_kwargs: dict
    synthesis_kwargs: dict
    measurement_kwargs: dict
    w_avg_decay: float = 0.995
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        z,
        angle,
        *,
        train: bool = False,
        style_mixing: bool = False,
        truncation_psi: float = 1.0,
        input_w: bool = False,
        gumbel_noise=None,
        fixed_noise=None,
        pe_cache=None,
        return_pe_cache: bool = False,
    ):
        mapping = MappingNetwork(**self.mapping_kwargs, name="mapping_network")
        syn_kwargs = dict(self.synthesis_kwargs)
        syn_kwargs.setdefault("compute_dtype", self.compute_dtype)
        synthesis = SynthesisNetwork(**syn_kwargs, name="synthesis_network")
        if return_pe_cache:
            # one-time PE pyramid for a fixed sensor grid:
            #   cache = G.apply(vars, None, angle, return_pe_cache=True)
            #   G.apply(vars, z, angle, pe_cache=cache)  # per-call PE work skipped
            return synthesis(None, angle, return_pe_cache=True)
        w = self._style(
            mapping,
            z,
            synthesis.num_styles,
            self.mapping_kwargs["in_ch"],
            train=train,
            style_mixing=style_mixing,
            truncation_psi=truncation_psi,
            input_w=input_w,
        )
        o = synthesis(w, angle, train=train, fixed_noise=fixed_noise,
                      pe_cache=pe_cache)
        o["w"] = w
        rng = None
        if gumbel_noise is None:
            rng = self.make_rng("gumbel")
        return apply_raydrop(
            o,
            rng=rng,
            raydrop_const=float(self.measurement_kwargs.get("raydrop_const", -1)),
            gumbel_temperature=float(
                self.measurement_kwargs.get("gumbel_temperature", 1.0)
            ),
            logistic_noise=gumbel_noise,
        )


def build_pe_cache(G, variables, angle, sharding=None):
    """Precompute the per-block Fourier-PE pyramid for a fixed sensor grid.

    The ONE canonical builder (Trainer, test_gan, bench/eval scripts all route
    through here): returns None for generator archs without the pe_cache
    contract, otherwise the tuple to feed as ``G.apply(..., pe_cache=cache)``.
    `variables` needs only the "consts" collection. With `sharding`, the cache
    is committed there (e.g. replicated over a mesh)."""
    if not isinstance(G, Generator):
        return None
    cache = jax.jit(lambda v, a: G.apply(v, None, a, return_pe_cache=True))(
        variables, angle
    )
    return cache if sharding is None else jax.device_put(cache, sharding)


class ResidualBlock(nn.Module):
    """conv3x3 -> blur-downsample conv3x3 stride2, plus 1x1 stride-2 skip, /sqrt(2)
    (reference dusty_v2.py:325-345)."""

    in_ch: int
    out_ch: int
    ring: bool = True

    @nn.compact
    def __call__(self, x, blur_fuse: bool = True):
        from ..ops.blurconv import blur_conv_fusable

        window = (1, 3, 3, 1)
        h = RingConv2d(
            self.in_ch, self.in_ch, 3, 1, 1, use_bias=False, ring=self.ring, name="conv1"
        )(x)
        h = FusedLeakyReLU(self.in_ch, name="bias_act1")(h)
        # blur folded into the strided convs (one composite conv per path instead
        # of blur passes + conv; exact — ops/blurconv.py; 48.7 -> 32.3 ms trunk
        # fwd+dgrad at B=128 bf16, scripts/bench_dfuse.py). The composite has 4x
        # the conv FLOPs, so it only wins on dgrad-only/forward paths — callers
        # that need D WEIGHT grads (D phase, R1) pass blur_fuse=False.
        fuse = blur_fuse and blur_conv_fusable(h.shape, 3, 2, 1, self.ring, "replicate")
        bw = window if fuse else None
        if not fuse:
            blur = make_resample(window=window, ring=self.ring)
            h = resample(h, blur)
        h = RingConv2d(
            self.in_ch, self.out_ch, 3, 2, 1, use_bias=False, ring=self.ring,
            blur_window=bw, name="conv2",
        )(h)
        h = FusedLeakyReLU(self.out_ch, name="bias_act2")(h)
        s = x if fuse else resample(x, blur)
        s = RingConv2d(
            self.in_ch, self.out_ch, 1, 2, 0, use_bias=False, ring=self.ring,
            blur_window=bw, name="skip",
        )(s)
        return (h + s) / math.sqrt(2.0)


class Discriminator(nn.Module):
    """StyleGAN2-style residual discriminator with BlurVH pre-blur and minibatch-stddev
    epilogue (reference dusty_v2.py:348-396)."""

    in_ch: int
    ch_base: int = 32
    ch_max: int = 512
    mbdis_group: int = 4
    mbdis_feat: int = 1
    resolution: Tuple[int, int] = (64, 512)
    ring: bool = True
    num_fp16_layers: int = -1
    pre_blur: bool = True
    compute_dtype: str = "float32"
    remat: bool = False  # rematerialize residual blocks (large-batch HBM relief)

    @nn.compact
    def __call__(self, x, train: bool = False, blur_fuse: bool = True):
        from ..ops import EqualLRConv2d, blur_vh

        res_in = tuple(self.resolution)
        n_down = int(np.log2(min(res_in) / 4))
        res_out = tuple(r >> n_down for r in res_in)
        ch = lambda i: min(self.ch_base << i, self.ch_max)

        n_layers = (1 if self.pre_blur else 0) + 2 + n_down
        low = jnp.dtype("bfloat16") if self.compute_dtype == "bfloat16" else jnp.dtype(
            "float32"
        )

        def layer_dtype(i):
            use_low = self.num_fp16_layers == -1 or i < self.num_fp16_layers
            return low if use_low else jnp.dtype("float32")

        i = 0
        h = x
        if self.pre_blur:
            h = blur_vh(h.astype(layer_dtype(i)), ring=self.ring)
            i += 1
        in_ch = self.in_ch * 2 if self.pre_blur else self.in_ch
        h = RingConv2d(
            in_ch, ch(0), 1, 1, 0, use_bias=False, ring=self.ring, name="stem"
        )(h.astype(layer_dtype(i)))
        i += 1
        h = FusedLeakyReLU(ch(0), name="stem_act")(h.astype(layer_dtype(i)))
        i += 1
        rb_cls = (
            nn.checkpoint(ResidualBlock, static_argnums=(2,))
            if self.remat
            else ResidualBlock
        )
        for j in range(n_down):
            h = rb_cls(ch(j), ch(j + 1), self.ring, name=f"res{j}")(
                h.astype(layer_dtype(i)), blur_fuse
            )
            i += 1

        h = h.astype(jnp.float32)
        # epilogue (the reference hardcodes ch(4); ch(n_down) is identical at the
        # shipped 64-high resolution and correct for other resolutions)
        ch_epi = ch(n_down)
        h = minibatch_stddev(h, group=self.mbdis_group, features=self.mbdis_feat)
        h = RingConv2d(
            ch_epi + self.mbdis_feat, ch_epi, 3, 1, 1, use_bias=False, ring=self.ring,
            name="epi_conv",
        )(h)
        h = FusedLeakyReLU(ch_epi, name="epi_act1")(h)
        h = h.reshape(h.shape[0], -1)
        h = EqualLRDense(
            in_features=ch_epi * int(np.prod(res_out)),
            features=ch_epi,
            use_bias=False,
            name="fc1",
        )(h)
        h = FusedLeakyReLU(ch_epi, name="epi_act2")(h)
        h = EqualLRDense(in_features=ch_epi, features=1, name="fc2")(h)
        return h
