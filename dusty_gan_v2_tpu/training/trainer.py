"""StyleGAN2-ADA training engine, TPU-native.

Behavioral equivalent of reference `gans/trainer.py:44-567`, redesigned for SPMD:

  * the whole iteration (G adv step, lazy PL, D adv step, lazy R1, EMA, ADA stats) is a
    pure function of a replicated `GANTrainState` + a data-sharded batch, compiled once
    per lazy-regularizer combination and run under `jax.shard_map` over a 1-D "data"
    mesh — DDP grad all-reduce becomes an explicit `psum` mean;
  * lazy regularization is python-level dispatch on `iteration % lazy.{pl,gp}` (four
    static step variants) instead of in-graph branching;
  * R1 and path-length penalties use nested `jax.grad` (double backward is native; the
    reference needed GradScaler plumbing and custom autograd Functions);
  * mixed precision is bfloat16 (no GradScalers);
  * per-device RNG = fold_in(step_rng, axis_index("data")), replacing per-rank seeds.

Optimizer lazy-regularization rescaling (lr*c, beta**c with c = lazy/(lazy+1)) matches
reference trainer.py:142-171.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..augment.ada import AdaptiveAugment, AdaState
from ..models import build_discriminator, build_generator, gan_loss_d, gan_loss_g
from ..ops.pad import filter2d
from ..parallel.mesh import DATA_AXIS, make_mesh
from ..parallel.persample import global_ids, per_sample_keys, ps_normal
from ..utils import sigmoid_to_tanh
from .train_state import GANTrainState, d_variables, g_variables

try:
    from jax import shard_map as _shard_map_fn  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except TypeError:  # older kwarg name
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def fetch_reals(batch, min_depth, max_depth, raydrop_const):
    """depth (m) + mask -> tanh-scaled inv-depth-norm with dropped rays filled
    (reference trainer.py:211-217).

    The mask may be omitted: KITTIRaw zeroes every channel outside the mask, so
    mask == (depth > 0) exactly — train_gan ships only the depth plane to halve
    the host->device bytes (the tunnel-attached TPU is upload-bound; BASELINE.md).
    Depth may also arrive float16 (`dataset.upload_dtype`); compute stays f32."""
    depth = batch["depth"].astype(jnp.float32)
    mask = (
        batch["mask"] if "mask" in batch else (depth > 0.0).astype(jnp.float32)
    )
    valid = ((depth >= min_depth) & (depth <= max_depth) & (depth > 0.0)).astype(
        depth.dtype
    )
    inv_norm = min_depth / jnp.where(valid > 0, depth, 1.0) * valid
    x = sigmoid_to_tanh(inv_norm)
    x = mask * x + (1.0 - mask) * raydrop_const
    return {"image": x, "raydrop_mask": mask}


def warmup_fn(x, rng, dropout_ratio, raydrop_const, blur_kernel=None, ids=None):
    """StyleGAN3-style warmup: optional gaussian blur + input dropout
    (reference trainer.py:234-245). blur_kernel is a fixed-length host-computed kernel
    (zero taps beyond 3*sigma), so no recompilation as sigma decays.

    The dropout mask is drawn per-sample by global id (parallel/persample.py) so the
    step is device-count invariant; `ids` overrides for concatenated sub-batches."""
    if blur_kernel is not None:
        x = filter2d(x, blur_kernel)
    if ids is None:
        ids = global_ids(x.shape[0])
    keys = per_sample_keys(rng, ids)
    keep = jax.vmap(
        lambda k: jax.random.bernoulli(k, 1.0 - dropout_ratio, x.shape[1:])
    )(keys).astype(x.dtype)
    return keep * x + (1.0 - keep) * raydrop_const


def make_blur_kernel(blur_sigma: float, blur_init_sigma: float) -> Optional[np.ndarray]:
    """Fixed-size gaussian kernel (length from the *initial* sigma); taps beyond the
    current 3*sigma are zero, so results equal the reference's shrinking kernel."""
    max_size = int(np.floor(blur_init_sigma * 3))
    if max_size <= 0:
        return None
    t = np.arange(-max_size, max_size + 1, dtype=np.float32)
    if blur_sigma <= 0:
        k = (t == 0).astype(np.float32)
        return k
    size = int(np.floor(blur_sigma * 3))
    k = np.exp2(-((t / blur_sigma) ** 2))
    k[np.abs(t) > size] = 0.0
    return k


class Trainer:
    """Host-side orchestration: builds models/optimizers, compiles the step variants,
    owns the state pytree and checkpointing."""

    def __init__(self, cfg, mesh=None, angle=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.resolution = tuple(cfg.model.generator.synthesis_kwargs.resolution)

        self.G = build_generator(cfg.model.generator)
        self.D = build_discriminator(cfg.model.discriminator)
        self.ada = AdaptiveAugment(
            p_init=cfg.training.augment.p_init,
            p_target=cfg.training.augment.p_target,
            kimg=cfg.training.augment.kimg,
            **cfg.training.augment.policy,
        )
        if angle is None:
            from ..geometry import CoordBridge

            coord = CoordBridge(
                num_ring=self.resolution[0],
                num_points=self.resolution[1],
                min_depth=cfg.dataset.min_depth,
                max_depth=cfg.dataset.max_depth,
                angle_file=f"data/coords/{cfg.dataset.name}.npy",
            )
            angle = coord.angle
        self.angle = jnp.asarray(angle)

        self.arch = cfg.model.generator.arch
        self.z_dim = (
            cfg.model.generator.mapping_kwargs.in_ch
            if "mapping_kwargs" in cfg.model.generator
            else cfg.model.generator.synthesis_kwargs.in_ch
        )
        self.num_devices = self.mesh.shape[DATA_AXIS]
        self.batch_size = cfg.training.batch_size
        assert self.batch_size % self.num_devices == 0
        self.B_local = self.batch_size // self.num_devices

        # effective loss weights & lazy ratios (reference trainer.py:142-171)
        loss_cfg = cfg.training.loss
        self.w_gan = float(loss_cfg.gan)
        self.lazy_gp = int(cfg.training.lazy.gp)
        self.lazy_pl = int(cfg.training.lazy.pl)
        self.lazy_ada = int(cfg.training.lazy.ada)
        self.w_gp = float(loss_cfg.gp) * self.lazy_gp if loss_cfg.get("gp", 0) > 0 else 0.0
        self.w_pl = float(loss_cfg.pl) * self.lazy_pl if loss_cfg.get("pl", 0) > 0 else 0.0
        c_G = self.lazy_pl / (self.lazy_pl + 1.0) if self.w_pl > 0 else 1.0
        c_D = self.lazy_gp / (self.lazy_gp + 1.0) if self.w_gp > 0 else 1.0
        lr = cfg.training.lr
        self.opt_G = optax.adam(
            lr.generator.alpha * c_G,
            b1=lr.generator.beta1**c_G,
            b2=lr.generator.beta2**c_G,
        )
        self.opt_D = optax.adam(
            lr.discriminator.alpha * c_D,
            b1=lr.discriminator.beta1**c_D,
            b2=lr.discriminator.beta2**c_D,
        )

        self.gan_objective = cfg.training.gan_objective
        self.use_real_in_g = self.gan_objective in ("ragan", "rahinge", "ralsgan")
        self.raydrop_const = float(cfg.dataset.raydrop_const)
        self.min_depth = float(cfg.dataset.min_depth)
        self.max_depth = float(cfg.dataset.max_depth)

        wcfg = cfg.training.warmup
        self.warmup_fade_imgs = float(wcfg.fade_kimg) * 1e3
        self.blur_init_sigma = float(wcfg.blur_init_sigma)
        self.dropout_init_ratio = float(wcfg.dropout_init_ratio)

        # hoisted Fourier-PE pyramid (r5): the PE volumes are pure constants of
        # the fixed sensor angle grid + the frozen "consts" bank, yet were
        # recomputed (einsum + sin/cos + the whole angle pyramid) inside EVERY
        # G.apply — 3-4x per training step. They are fed as runtime args (NOT
        # jit closures: large closed-over constants trip the remote-compile
        # payload limit) and are bit-identical to the in-call computation
        # (tests/test_models.py::test_pe_cache_exactness, test_trainer.py).
        import os as _os

        self.use_pe_cache = (
            self.arch == "dusty_v2"
            and not _os.environ.get("DUSTY_TPU_DISABLE_PECACHE")
        )
        self._pe_cache = None
        self._pe_cache_sig = None

        self._step_cache: Dict[Tuple[bool, bool, bool], Callable] = {}

    # ------------------------------------------------------------------ state
    def init_state(self, rng) -> GANTrainState:
        kG, kD, kg = jax.random.split(rng, 3)
        z = jnp.zeros((2, self.z_dim), jnp.float32)
        g_vars = self.G.init(
            {"params": kG, "gumbel": kg, "noise": jax.random.PRNGKey(0)},
            z,
            self.angle,
        )
        x = jnp.zeros((4, 1, *self.resolution), jnp.float32)
        d_vars = self.D.init(kD, x)
        params_G = g_vars["params"]
        stats_G = g_vars.get("stats", {})
        consts_G = g_vars.get("consts", {})
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            params_G=params_G,
            stats_G=stats_G,
            consts_G=consts_G,
            params_D=d_vars["params"],
            params_G_ema=jax.tree_util.tree_map(jnp.copy, params_G),
            stats_G_ema=jax.tree_util.tree_map(jnp.copy, stats_G),
            opt_G=self.opt_G.init(params_G),
            opt_D=self.opt_D.init(d_vars["params"]),
            ada=self.ada.init_state(),
            pl_ema=jnp.zeros(()),
        )
        return jax.device_put(
            state, jax.sharding.NamedSharding(self.mesh, P())
        )

    # ------------------------------------------------------------------ schedule
    def warmup_params(self, iteration: int) -> Tuple[float, float]:
        num_imgs = iteration * self.batch_size
        if self.warmup_fade_imgs > 0:
            f = max(1.0 - num_imgs / self.warmup_fade_imgs, 0.0)
            return f * self.blur_init_sigma, f * self.dropout_init_ratio
        return 0.0, 0.0

    def ema_decay(self, iteration: int) -> float:
        ema_imgs = self.cfg.training.ema_kimg * 1e3
        rampup = self.cfg.training.get("ema_rampup", None)
        if rampup is not None:
            ema_imgs = min(ema_imgs, iteration * self.batch_size * rampup)
        return 0.5 ** (self.batch_size / max(ema_imgs, 1e-8))

    # ------------------------------------------------------------------ the step
    def _g_apply(self, state_vars, z, rngs, train=True, input_w=False, mutable=True):
        kwargs = dict(train=train, input_w=input_w)
        if mutable:
            return self.G.apply(
                state_vars, z, self.angle, rngs=rngs, mutable=["stats"], **kwargs
            )
        return self.G.apply(state_vars, z, self.angle, rngs=rngs, **kwargs)

    def _build_step(
        self, do_pl: bool, do_r1: bool, do_ada: bool, skip_warmup: bool = False
    ) -> Callable:
        G, D, ada = self.G, self.D, self.ada
        angle = self.angle
        B = self.B_local
        z_dim = self.z_dim
        w_gan, w_gp, w_pl = self.w_gan, self.w_gp, self.w_pl
        metric = self.gan_objective
        use_real_in_g = self.use_real_in_g
        raydrop_const = self.raydrop_const
        has_blur = self.blur_init_sigma > 0

        def g_rngs(rng):
            k = jax.random.split(rng, 4)
            return {"gumbel": k[0], "noise": k[1], "styles": k[2], "aug": k[3]}

        if skip_warmup:
            # steady-state variant: once warmup has faded (dropout_ratio == 0 and
            # blur_sigma == 0 — >99% of the reference's 25M-img schedule at
            # fade_kimg=200) the warmup op is the exact identity (bernoulli(1.0)
            # keep masks; no/delta blur kernel), so skip the per-sample RNG and
            # mask work entirely. Each warmup site has its own dedicated key, so
            # skipping consumes no randomness any other draw depends on.
            def wu(x, rng, dropout_ratio, blur_kernel, ids=None):
                return x
        else:
            def wu(x, rng, dropout_ratio, blur_kernel, ids=None):
                return warmup_fn(
                    x, rng, dropout_ratio, raydrop_const,
                    blur_kernel if has_blur else None, ids=ids,
                )

        n_dev = self.mesh.shape[DATA_AXIS]
        B_global = B * n_dev

        use_pc = self.use_pe_cache

        def step_fn(state, batch, rng, it, ema_decay, dropout_ratio, blur_kernel,
                    pe_cache):
            # static gate: archs without the pe_cache kwarg never see it
            pe_kw = {"pe_cache": pe_cache} if use_pc else {}
            # per-iteration fold happens INSIDE the jit: an eager host-side
            # fold_in costs a remote dispatch round-trip per iteration on
            # tunnel-attached TPUs (same values as the former host fold).
            # The stream key is NOT axis-folded: every per-sample draw below keys
            # off the sample's GLOBAL id (parallel/persample.py), which makes the
            # whole step a pure function of (global batch, run key) regardless of
            # device count — a property DDP lacks (tests/test_parallel.py).
            rng = jax.random.fold_in(rng, it)
            keys = jax.random.split(rng, 16)
            metrics = {}

            reals = fetch_reals(
                batch, self.min_depth, self.max_depth, raydrop_const
            )
            x_real = reals["image"]

            # ============================ G phase ============================
            def g_loss_fn(params_G):
                gv = {"params": params_G, "stats": state.stats_G, "consts": state.consts_G}
                z = ps_normal(keys[0], global_ids(B), (z_dim,))
                o, mut = G.apply(
                    gv, z, angle, train=True, rngs=g_rngs(keys[1]),
                    mutable=["stats"], **pe_kw
                )
                x_fake = o["image"]
                x_fake = wu(x_fake, keys[2], dropout_ratio, blur_kernel)
                x_fake = ada(x_fake, state.ada.p, keys[3])
                # blur_fuse=False even here (dgrad-only): the composite wins the
                # standalone trunk bench but consistently LOSES ~4% inside the
                # full step (in-process A/B/A/B, scripts/bench_train.py
                # --ab_blurconv; BASELINE.md r4)
                y_fake = D.apply(
                    {"params": state.params_D}, x_fake, train=True, blur_fuse=False
                )
                if use_real_in_g:
                    xr = wu(x_real, keys[4], dropout_ratio, blur_kernel)
                    xr = jax.lax.stop_gradient(ada(xr, state.ada.p, keys[5]))
                    y_real = D.apply(
                        {"params": state.params_D}, xr, train=True, blur_fuse=False
                    )
                else:
                    y_real = None
                loss = w_gan * gan_loss_g(y_real, y_fake, metric)
                return loss, mut["stats"]

            (loss_G, stats_G), grads_G = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params_G
            )
            grads_G = jax.lax.pmean(grads_G, DATA_AXIS)
            upd, opt_G = self.opt_G.update(grads_G, state.opt_G, state.params_G)
            params_G = optax.apply_updates(state.params_G, upd)
            metrics["loss/G/adversarial"] = loss_G / w_gan
            pl_ema = state.pl_ema

            # ============================ PL reg =============================
            if do_pl:
                B_pl = max(B // 2, 1)
                gv = {"params": params_G, "stats": stats_G, "consts": state.consts_G}
                z_pl = ps_normal(keys[6], global_ids(B_pl), (z_dim,))
                # style codes (no stats update on this pass)
                o_w = G.apply(gv, z_pl, angle, train=False, rngs=g_rngs(keys[7]),
                              **pe_kw)
                w = jax.lax.stop_gradient(o_w["w"])
                img_shape = o_w["image"].shape
                noise_pl = ps_normal(
                    keys[8], global_ids(B_pl), img_shape[1:]
                ) / math.sqrt(float(np.prod(img_shape[2:])))
                pl_rngs = g_rngs(keys[9])

                def pl_loss_fn(params):
                    gv2 = {"params": params, "stats": stats_G, "consts": state.consts_G}

                    def inner(w_in):
                        o2, mut2 = G.apply(
                            gv2, w_in, angle, train=True, input_w=True,
                            rngs=pl_rngs, mutable=["stats"], **pe_kw,
                        )
                        return jnp.sum(o2["image"] * noise_pl), mut2["stats"]

                    gw, stats2 = jax.grad(inner, has_aux=True)(w)
                    lengths = jnp.sqrt(jnp.sum(jnp.square(gw), axis=-1))  # (B, N) | (B,)
                    mean_len = jax.lax.pmean(jnp.mean(lengths), DATA_AXIS)
                    pl_ema_new = pl_ema + 0.01 * (
                        jax.lax.stop_gradient(mean_len) - pl_ema
                    )
                    penalty = jnp.mean(jnp.square(lengths - pl_ema_new))
                    return w_pl * penalty, (stats2, pl_ema_new, penalty)

                (_, (stats_G, pl_ema, pl_pen)), grads_pl = jax.value_and_grad(
                    pl_loss_fn, has_aux=True
                )(params_G)
                grads_pl = jax.lax.pmean(grads_pl, DATA_AXIS)
                upd, opt_G = self.opt_G.update(grads_pl, opt_G, params_G)
                params_G = optax.apply_updates(params_G, upd)
                metrics["loss/G/path_length"] = pl_pen
                metrics["loss/G/path_length/baseline"] = pl_ema

            # ============================ D phase ============================
            gv = {"params": params_G, "stats": stats_G, "consts": state.consts_G}

            def d_loss_fn(params_D):
                z = ps_normal(keys[10], global_ids(B), (z_dim,))
                o, mut = G.apply(
                    gv, z, angle, train=True, rngs=g_rngs(keys[11]),
                    mutable=["stats"], **pe_kw
                )
                x_fake = jax.lax.stop_gradient(o["image"])
                # warmup + ADA are strictly per-sample: run reals and fakes as ONE
                # concatenated batch (halves the fixed cost of the aug pipeline; the
                # reference augments them separately, trainer.py:383-396, which is
                # distributionally identical). D stays separate — minibatch-stddev
                # statistics must not mix reals with fakes.
                xcat = jnp.concatenate([x_real, x_fake], axis=0)
                # disjoint id ranges for the two halves: on ANY mesh size the reals
                # keep ids [0, B_global) and the fakes [B_global, 2*B_global), so the
                # per-sample warmup/ADA draws match a single-device run exactly
                ids_cat = jnp.concatenate(
                    [global_ids(B), global_ids(B, offset=B_global)]
                )
                xcat = wu(xcat, keys[12], dropout_ratio, blur_kernel, ids=ids_cat)
                xcat = jax.lax.stop_gradient(
                    ada(xcat, state.ada.p, keys[14], ids=ids_cat)
                )
                xr, xf = xcat[:B], xcat[B:]
                # blur_fuse=False: this phase takes D WEIGHT grads, where the
                # blur->conv composite's 4x conv FLOPs lose to the unfused pair
                # (ops/blurconv.py cost model; full-step A/B in BASELINE.md)
                y_real = D.apply({"params": params_D}, xr, train=True, blur_fuse=False)
                y_fake = D.apply({"params": params_D}, xf, train=True, blur_fuse=False)
                loss = w_gan * gan_loss_d(y_real, y_fake, metric)
                return loss, (mut["stats"], y_real, y_fake)

            (loss_D, (stats_G, y_real, y_fake)), grads_D = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_D)
            grads_D = jax.lax.pmean(grads_D, DATA_AXIS)
            upd, opt_D = self.opt_D.update(grads_D, state.opt_D, state.params_D)
            params_D = optax.apply_updates(state.params_D, upd)
            ada_state = ada.cumulate(state.ada, y_real, axis_name=DATA_AXIS)
            metrics["loss/D/adversarial"] = loss_D / w_gan
            metrics["loss/D/output/real"] = jnp.mean(y_real)
            metrics["loss/D/output/fake"] = jnp.mean(y_fake)

            # ============================ R1 reg =============================
            if do_r1:
                # keys[13]/[15] are dedicated — keys[8]/[9] are consumed by PL
                r1_key1, r1_key2 = keys[13], keys[15]

                def r1_loss_fn(params_D_):
                    def d_of_x(x):
                        xx = wu(x, r1_key1, dropout_ratio, blur_kernel)
                        xx = ada(xx, state.ada.p, r1_key2)
                        # blur_fuse=False: R1 differentiates w.r.t. D params too
                        return jnp.sum(
                            D.apply({"params": params_D_}, xx, train=True,
                                    blur_fuse=False)
                        )

                    g = jax.grad(d_of_x)(x_real)
                    penalty = jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
                    return (w_gp / 2.0) * penalty, penalty

                (_, r1_pen), grads_r1 = jax.value_and_grad(r1_loss_fn, has_aux=True)(
                    params_D
                )
                grads_r1 = jax.lax.pmean(grads_r1, DATA_AXIS)
                upd, opt_D = self.opt_D.update(grads_r1, opt_D, params_D)
                params_D = optax.apply_updates(params_D, upd)
                metrics["loss/D/gradient_penalty"] = r1_pen

            # ============================ EMA + ADA ==========================
            params_G_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.params_G_ema,
                params_G,
            )
            stats_G_ema = jax.tree_util.tree_map(lambda s: s, stats_G)

            if do_ada:
                ada_state, rt = ada.update_p(ada_state)
                metrics["stats/ada_rt"] = rt
            metrics["stats/ada_p"] = ada_state.p

            metrics = {k: jax.lax.pmean(v, DATA_AXIS) for k, v in metrics.items()}

            new_state = GANTrainState(
                step=state.step + 1,
                params_G=params_G,
                stats_G=stats_G,
                consts_G=state.consts_G,
                params_D=params_D,
                params_G_ema=params_G_ema,
                stats_G_ema=stats_G_ema,
                opt_G=opt_G,
                opt_D=opt_D,
                ada=ada_state,
                pl_ema=pl_ema,
            )
            return new_state, metrics

        sharded = _shard_map(
            step_fn,
            self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
        )
        return jax.jit(sharded, donate_argnums=(0,))

    def get_step_fn(
        self, iteration: int, skip_warmup: bool = False
    ) -> Tuple[Callable, bool, bool, bool]:
        do_pl = self.w_pl > 0 and iteration % self.lazy_pl == 0
        do_r1 = self.w_gp > 0 and iteration % self.lazy_gp == 0
        do_ada = iteration % self.lazy_ada == 0
        key = (do_pl, do_r1, do_ada, skip_warmup)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(*key)
        return self._step_cache[key], do_pl, do_r1, do_ada

    def pe_cache_for(self, state: GANTrainState):
        """Per-run PE pyramid (see __init__): computed ONCE from the state's
        frozen consts + the fixed angle grid, then reused by every step. The
        consts never change within a run (training never writes them; donation
        aliases the same values through). A structural consts change (different
        arch/config) triggers an automatic rebuild; a VALUE swap with identical
        structure (e.g. hot-swapping a different-seed checkpoint into a live
        Trainer) is not detectable without per-step device reads — call
        invalidate_pe_cache() after any such swap."""
        if not self.use_pe_cache:
            return None
        from ..models import build_pe_cache

        sig = jax.tree_util.tree_structure(state.consts_G), tuple(
            (l.shape, str(l.dtype))
            for l in jax.tree_util.tree_leaves(state.consts_G)
        )
        if self._pe_cache is None or sig != self._pe_cache_sig:
            self._pe_cache = build_pe_cache(
                self.G, {"params": {}, "consts": state.consts_G}, self.angle,
                sharding=jax.sharding.NamedSharding(self.mesh, P()),
            )
            self._pe_cache_sig = sig
        return self._pe_cache

    def invalidate_pe_cache(self):
        self._pe_cache = None

    def step(self, state: GANTrainState, batch, rng, iteration: int):
        """One full training iteration (host entry point).

        `rng` is the RUN key (constant across iterations; the per-iteration
        fold_in happens inside the jit). All host-varying inputs are numpy
        scalars/arrays — eager jnp ops here would each cost a remote dispatch
        round-trip per iteration on tunnel-attached TPUs."""
        blur_sigma, dropout_ratio = self.warmup_params(iteration)
        fn, *_ = self.get_step_fn(
            iteration, skip_warmup=(dropout_ratio == 0.0 and blur_sigma == 0.0)
        )
        blur_kernel = make_blur_kernel(blur_sigma, self.blur_init_sigma)
        if blur_kernel is None:
            blur_kernel = np.zeros((1,), np.float32)  # unused placeholder
        return fn(
            state,
            batch,
            rng,
            np.uint32(iteration),
            np.float32(self.ema_decay(iteration)),
            np.float32(dropout_ratio),
            blur_kernel,
            self.pe_cache_for(state),
        )

    def augment_reals(self, state: GANTrainState, batch, rng, iteration: int):
        """reals -> warmup -> ADA at the current p; the reference's augmented-reals
        debug panel (train_gan.py:122-131: `trainer.A(trainer.warmup(reals))`)."""
        x = fetch_reals(
            batch, self.min_depth, self.max_depth, self.raydrop_const
        )["image"]
        blur_sigma, dropout_ratio = self.warmup_params(iteration)
        blur_kernel = make_blur_kernel(blur_sigma, self.blur_init_sigma)
        k1, k2 = jax.random.split(rng)
        x = warmup_fn(
            x, k1, dropout_ratio, self.raydrop_const,
            jnp.asarray(blur_kernel) if blur_kernel is not None else None,
        )
        return self.ada(x, state.ada.p, k2)

    # ------------------------------------------------------------------ sampling
    def sample(self, state: GANTrainState, z, rng, ema: bool = True, **kwargs):
        variables = (
            {
                "params": state.params_G_ema,
                "stats": state.stats_G_ema,
                "consts": state.consts_G,
            }
            if ema
            else g_variables(state)
        )
        k1, k2 = jax.random.split(rng)
        return self.G.apply(
            variables, z, self.angle, rngs={"gumbel": k1, "noise": k2}, **kwargs
        )
