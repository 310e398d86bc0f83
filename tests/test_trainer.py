"""Training-engine smoke tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.parallel import make_mesh
from dusty_gan_v2_tpu.training import Trainer, fetch_reals
from dusty_gan_v2_tpu.utils.config import Config

RES = (8, 64)  # tiny: this box can have a single CPU core


def tiny_cfg(**overrides):
    cfg = Config(
        {
            "dataset": {
                "name": "kitti_raw",
                "min_depth": 1.45,
                "max_depth": 80,
                "raydrop_const": -1,
            },
            "training": {
                "random_seed": 0,
                "total_kimg": 1,
                "ema_kimg": 10,
                "ema_rampup": 0.05,
                "batch_size": 8,
                "gan_objective": "nsgan",
                "loss": {"gan": 1, "gp": 1, "pl": 1},
                "lazy": {"gp": 4, "pl": 2, "ada": 2},
                "lr": {
                    "generator": {"alpha": 0.002, "beta1": 0, "beta2": 0.99},
                    "discriminator": {"alpha": 0.002, "beta1": 0, "beta2": 0.99},
                },
                "augment": {
                    "p_init": 0.0,
                    "p_target": 0.6,
                    "kimg": 500,
                    "policy": {
                        "lr_flip": 1, "ud_flip": 1, "int_trans": 1, "iso_scale": 1,
                        "frac_trans": 1, "brightness": 1, "contrast": 1,
                        "luma_flip": 1, "hue": 1, "saturation": 1,
                        "imgfilter": 0, "noise": 0, "cutout": 0,
                    },
                },
                "warmup": {
                    "fade_kimg": 1,
                    "blur_init_sigma": 0,
                    "dropout_init_ratio": 0.5,
                },
            },
            "model": {
                "generator": {
                    "arch": "dusty_v2",
                    "mapping_kwargs": {"in_ch": 16, "out_ch": 16, "depth": 2},
                    "synthesis_kwargs": {
                        "in_ch": 16,
                        "out_ch": [
                            {"name": "image", "ch": 1, "act": "tanh"},
                            {"name": "raydrop_logit", "ch": 1, "act": None},
                        ],
                        "ch_base": 4,
                        "ch_max": 16,
                        "resolution": list(RES),
                        "layers": [2, 2],
                        "ring": True,
                        "use_noise": False,
                        "aug_coords": True,
                    },
                    "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
                },
                "discriminator": {
                    "arch": "dusty_v2",
                    "layer_kwargs": {
                        "in_ch": 1,
                        "ring": True,
                        "ch_base": 4,
                        "ch_max": 16,
                        "resolution": list(RES),
                        "mbdis_group": 4,
                        "mbdis_feat": 1,
                        "pre_blur": True,
                    },
                },
            },
        }
    )
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


def make_angle(res):
    elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
    azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
    return jnp.asarray(np.stack(np.meshgrid(elev, azim, indexing="ij"), axis=0)[None])


def synth_batch(rng, B, res):
    depth = rng.uniform(2.0, 79.0, (B, 1, *res)).astype(np.float32)
    mask = (rng.rand(B, 1, *res) > 0.1).astype(np.float32)
    return {"depth": jnp.asarray(depth), "mask": jnp.asarray(mask)}


def fresh(state):
    """Deep-copy a state pytree: the jitted step donates its input buffers."""
    return jax.tree_util.tree_map(jnp.copy, state)


@pytest.fixture(scope="module")
def trainer_and_state():
    mesh = make_mesh(jax.devices()[:2])  # 2-device submesh: full 8-dev path is covered
    # by __graft_entry__.dryrun_multichip; keep unit tests fast on a 1-core box
    t = Trainer(tiny_cfg(), mesh=mesh, angle=make_angle(RES))
    state = t.init_state(jax.random.PRNGKey(0))
    return t, state


class TestFetchReals:
    def test_encoding(self):
        depth = jnp.asarray(np.array([[[[10.0, 0.0, 100.0]]]], np.float32))
        mask = jnp.asarray(np.array([[[[1.0, 0.0, 0.0]]]], np.float32))
        out = fetch_reals({"depth": depth, "mask": mask}, 1.45, 80.0, -1.0)
        x = np.asarray(out["image"]).ravel()
        assert x[0] == pytest.approx(2 * (1.45 / 10.0) - 1.0, rel=1e-5)
        assert x[1] == -1.0 and x[2] == -1.0


class TestTrainStep:
    def test_steps_run_and_update(self, trainer_and_state):
        t, state = trainer_and_state
        rng = np.random.RandomState(0)
        p0 = jax.tree_util.tree_leaves(state.params_G)[0].copy()
        metrics_all = {}
        s = fresh(state)
        for it in range(1, 5):  # hits pl at 2,4; r1 at 4; ada at 2,4
            batch = synth_batch(rng, t.batch_size, RES)
            s, metrics = t.step(s, batch, jax.random.PRNGKey(it), it)
            metrics_all[it] = {k: float(v) for k, v in metrics.items()}
        assert int(s.step) == 4
        # params actually moved
        p1 = jax.tree_util.tree_leaves(s.params_G)[0]
        assert np.abs(np.asarray(p1) - np.asarray(p0)).max() > 0
        # losses finite
        for it, m in metrics_all.items():
            for k, v in m.items():
                assert np.isfinite(v), (it, k, v)
        # lazy scheduling: r1 only at iter 4, pl at 2 and 4
        assert "loss/D/gradient_penalty" not in metrics_all[1]
        assert "loss/D/gradient_penalty" in metrics_all[4]
        assert "loss/G/path_length" in metrics_all[2]
        assert "stats/ada_rt" in metrics_all[2]

    def test_skip_warmup_variant_is_exact(self, trainer_and_state):
        """Past the warmup fade (dropout_ratio == 0, blur_sigma == 0) the steady-state
        step variant skips the warmup op entirely; it must equal the full variant
        bit-for-bit in expectation (bernoulli(1.0) keep masks are all-ones and each
        warmup site has its own dedicated rng key, so no other draw shifts)."""
        t, state = trainer_and_state
        it = 201  # past fade_kimg=1 at B=8; 201 % 2 == 1, 201 % 4 == 1: adv-only
        assert t.warmup_params(it) == (0.0, 0.0)
        rng = np.random.RandomState(3)
        batch = synth_batch(rng, t.batch_size, RES)
        key = jax.random.PRNGKey(9)
        s1, m1 = t.step(fresh(state), batch, key, it)  # auto-selects skip_warmup
        assert (False, False, False, True) in t._step_cache
        fn_full = t._build_step(False, False, False, skip_warmup=False)
        s2, m2 = fn_full(
            fresh(state), batch, key, np.uint32(it),
            np.float32(t.ema_decay(it)), np.float32(0.0), np.zeros((1,), np.float32),
            t.pe_cache_for(state),
        )
        for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for k in m1:
            np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))

    def test_fetch_reals_maskless_matches(self):
        """Depth-only batches (upload-bandwidth path): mask == depth > 0 exactly
        under the KITTIRaw contract (channels zeroed outside the mask), incl. a
        float16-uploaded depth plane."""
        from dusty_gan_v2_tpu.training.trainer import fetch_reals

        rng = np.random.RandomState(3)
        depth = rng.uniform(1.45, 80.0, (4, 1, 8, 32)).astype(np.float32)
        mask = (rng.rand(4, 1, 8, 32) > 0.2).astype(np.float32)
        depth = depth * mask  # the dataset contract
        full = fetch_reals(
            {"depth": jnp.asarray(depth), "mask": jnp.asarray(mask)}, 1.45, 80.0, -1.0
        )
        maskless = fetch_reals({"depth": jnp.asarray(depth)}, 1.45, 80.0, -1.0)
        np.testing.assert_array_equal(np.asarray(full["image"]),
                                      np.asarray(maskless["image"]))
        np.testing.assert_array_equal(np.asarray(full["raydrop_mask"]),
                                      np.asarray(maskless["raydrop_mask"]))
        half = fetch_reals(
            {"depth": jnp.asarray(depth.astype(np.float16))}, 1.45, 80.0, -1.0
        )
        assert half["image"].dtype == jnp.float32
        assert float(jnp.abs(half["image"] - full["image"]).max()) < 1e-3

    def test_pe_cache_step_exactness(self, trainer_and_state):
        """The hoisted PE pyramid leaves the training step exact: one full-reg
        step (pl+r1+ada at iteration 4) with and without the cache produces
        equal params/stats/metrics up to fp reassociation (the two step
        variants are DIFFERENT compiled programs, so XLA's fusion order may
        differ by ~1 ULP; the direct-apply test in test_models.py, where the
        program pair matches, asserts bitwise equality)."""
        t, state = trainer_and_state
        assert t.use_pe_cache
        t2 = Trainer(tiny_cfg(), mesh=t.mesh, angle=make_angle(RES))
        t2.use_pe_cache = False  # before any step build: use_pc is baked per-Trainer
        rng = np.random.RandomState(3)
        batch = synth_batch(rng, t.batch_size, RES)
        s1, m1 = t.step(fresh(state), batch, jax.random.PRNGKey(9), 4)
        s2, m2 = t2.step(fresh(state), batch, jax.random.PRNGKey(9), 4)
        for k in m1:
            np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                       rtol=2e-5, atol=2e-6, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params_G),
                        jax.tree_util.tree_leaves(s2.params_G)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.stats_G),
                        jax.tree_util.tree_leaves(s2.stats_G)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def test_no_retrace_across_chained_steps(self, trainer_and_state):
        """State avals must be stable across a step: any weak_type / aval drift
        between init_state and step outputs makes the second chained step a jit
        cache MISS — a full silent recompile (~5-60 s on a remote device).
        Regression for the CRF-param weak_type bug found in the semseg vertical."""
        t, state = trainer_and_state
        rng = np.random.RandomState(7)
        s = fresh(state)
        fn, *_ = t.get_step_fn(1)  # adv-only variant (pl at 2,4; r1 at 4)
        batch = synth_batch(rng, t.batch_size, RES)
        s, _ = t.step(s, batch, jax.random.PRNGKey(1), 1)
        before = fn._cache_size()  # shared module fixture: cache may be warm
        batch = synth_batch(rng, t.batch_size, RES)
        s, _ = t.step(s, batch, jax.random.PRNGKey(3), 3)
        assert fn._cache_size() == before

    def test_ema_follows(self, trainer_and_state):
        t, state = trainer_and_state
        rng = np.random.RandomState(1)
        s = fresh(state)
        for it in range(1, 3):
            batch = synth_batch(rng, t.batch_size, RES)
            s, _ = t.step(s, batch, jax.random.PRNGKey(100 + it), it)
        # ema params differ from both init and current (partial move)
        e = jax.tree_util.tree_leaves(s.params_G_ema)[0]
        p = jax.tree_util.tree_leaves(s.params_G)[0]
        assert not np.allclose(np.asarray(e), np.asarray(p))

    def test_sample(self, trainer_and_state):
        t, state = trainer_and_state
        z = jax.random.normal(jax.random.PRNGKey(5), (4, t.z_dim))
        o = t.sample(state, z, jax.random.PRNGKey(6), ema=True, truncation_psi=0.7)
        assert o["image"].shape == (4, 1, *RES)
        assert np.isfinite(np.asarray(o["image"])).all()


class TestDeviceCountInvariance:
    """The strongest multi-chip correctness statement available without hardware
    (VERDICT r2 #3): the SAME global batch + run key stepped on a 1-device and an
    8-device mesh must produce identical losses and parameter updates.

    This holds by design (parallel/persample.py): every per-sample draw keys off the
    sample's global index, batch statistics (ModConv ema_var, w_avg) are pmean'd, and
    minibatch-stddev gathers the global batch. The reference's DDP training has no
    such property (per-rank seeds, per-GPU buffers/statistics)."""

    def _run(self, n_devices, n_iters=4):
        mesh = make_mesh(jax.devices()[:n_devices])
        cfg = tiny_cfg()
        # B_local must stay even on the 8-device mesh so the PL half-batch
        # (max(B//2,1)) covers the same global sample set on both meshes
        cfg["training"]["batch_size"] = 16
        t = Trainer(cfg, mesh=mesh, angle=make_angle(RES))
        state = t.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(42)
        metrics_all = []
        s = fresh(state)
        for it in range(1, n_iters + 1):  # hits pl at 2,4; r1 at 4; ada at 2,4
            batch = synth_batch(rng, t.batch_size, RES)
            s, metrics = t.step(s, batch, jax.random.PRNGKey(9), it)
            metrics_all.append({k: float(v) for k, v in metrics.items()})
        return s, metrics_all

    def test_one_vs_eight_devices(self):
        assert len(jax.devices()) >= 8
        s1, m1 = self._run(1)
        s8, m8 = self._run(8)
        for it, (a, b) in enumerate(zip(m1, m8), 1):
            assert a.keys() == b.keys(), it
            for k in a:
                np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5,
                                           err_msg=f"iter {it} {k}")
        for name in ("params_G", "params_D", "params_G_ema", "stats_G", "pl_ema"):
            ta = jax.tree_util.tree_leaves(getattr(s1, name))
            tb = jax.tree_util.tree_leaves(getattr(s8, name))
            for la, lb in zip(ta, tb):
                np.testing.assert_allclose(
                    np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5,
                    err_msg=name,
                )


class TestAccumulation:
    def test_matches_full_batch(self):
        from dusty_gan_v2_tpu.training.accumulation import microbatch_value_and_grad

        params = {"w": jnp.asarray(np.random.RandomState(0).randn(4).astype(np.float32))}
        batch = jnp.asarray(np.random.RandomState(1).randn(8, 4).astype(np.float32))

        def loss_fn(p, b):
            return jnp.mean((b @ p["w"]) ** 2)

        l0, g0 = jax.value_and_grad(loss_fn)(params, batch)
        l1, g1 = microbatch_value_and_grad(loss_fn, params, batch, 4)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g0["w"]), np.asarray(g1["w"]), rtol=1e-5
        )


class TestAugmentReals:
    def test_shapes_and_finite(self, trainer_and_state):
        t, state = trainer_and_state
        batch = synth_batch(np.random.RandomState(3), t.batch_size, RES)
        out = t.augment_reals(state, batch, jax.random.PRNGKey(9), iteration=1)
        assert out.shape == (t.batch_size, 1, *RES)
        assert np.isfinite(np.asarray(out)).all()


class TestFullPolicyStep:
    """One full step with imgfilter/noise/cutout enabled (the shipped configs keep
    them off; this proves the whole ADA tail compiles and differentiates through the
    R1 path). Needs H > fbank_taps//2 = 21 for imgfilter's reflect pad."""

    def test_step_with_full_ada_policy(self):
        res = (32, 64)
        cfg = tiny_cfg()
        cfg.training.lazy = Config({"gp": 1, "pl": 1, "ada": 1})
        cfg.training.augment.policy.imgfilter = 1
        cfg.training.augment.policy.noise = 1
        cfg.training.augment.policy.cutout = 1
        cfg.training.augment.p_init = 0.5
        cfg.model.generator.synthesis_kwargs.resolution = list(res)
        cfg.model.discriminator.layer_kwargs.resolution = list(res)
        mesh = make_mesh(jax.devices()[:2])
        t = Trainer(cfg, mesh=mesh, angle=make_angle(res))
        state = t.init_state(jax.random.PRNGKey(0))
        batch = synth_batch(np.random.RandomState(5), t.batch_size, res)
        state, metrics = t.step(state, batch, jax.random.PRNGKey(1), 1)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)


class TestGlobalBatchStep:
    def test_step_consumes_globally_sharded_batch(self, trainer_and_state):
        """train_gan.py now assembles batches with parallel.global_batch (multi-host
        path); the jitted shard_map step must accept the pre-sharded arrays."""
        from dusty_gan_v2_tpu.parallel import global_batch

        t, state = trainer_and_state
        raw = synth_batch(np.random.RandomState(11), t.batch_size, RES)
        batch = global_batch(t.mesh, {k: np.asarray(v) for k, v in raw.items()})
        state2, metrics = t.step(fresh(state), batch, jax.random.PRNGKey(2), 3)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)


class TestOtherArchsTrain:
    """vanilla / dusty_v1 must run the full SPMD step too (only their forwards are
    parity-tested elsewhere; PL falls back to grad-wrt-z for single-style archs)."""

    RES_V = (32, 64)  # vanilla projects to H/16 (reflect pad needs H/16 >= 2)

    def _cfg(self, g_arch, d_arch):
        cfg = tiny_cfg()
        cfg.training.lazy = Config({"gp": 1, "pl": 1, "ada": 1})
        cfg.model.generator = Config({
            "arch": g_arch,
            "mapping_kwargs": {"in_ch": 16, "out_ch": 16},
            "synthesis_kwargs": {
                "in_ch": 16,
                "out_ch": [
                    {"name": "image", "ch": 1, "act": None},
                    {"name": "raydrop_logit", "ch": 1, "act": None},
                ],
                "ch_base": 4, "ch_max": 16, "resolution": list(self.RES_V),
                "ring": True,
            },
            "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
        })
        if g_arch == "vanilla":
            # vanilla G has no measurement model / raydrop head wiring
            cfg.model.generator.measurement_kwargs = Config(
                {"raydrop_const": -1, "gumbel_temperature": 1})
        cfg.model.discriminator = Config({
            "arch": d_arch,
            "layer_kwargs": {"in_ch": 1, "ring": True, "ch_base": 4, "ch_max": 16,
                             "resolution": list(self.RES_V)},
        })
        return cfg

    @pytest.mark.parametrize("g_arch", ["vanilla", "dusty_v1"])
    def test_one_full_step(self, g_arch):
        cfg = self._cfg(g_arch, "vanilla")
        mesh = make_mesh(jax.devices()[:2])
        t = Trainer(cfg, mesh=mesh, angle=make_angle(self.RES_V))
        state = t.init_state(jax.random.PRNGKey(0))
        batch = synth_batch(np.random.RandomState(2), t.batch_size, self.RES_V)
        state, metrics = t.step(state, batch, jax.random.PRNGKey(1), 1)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (g_arch, k, v)
