"""Model-zoo tests: shapes, style plumbing, buffers, and the subgrid-consistency shift."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.models import build_discriminator, build_generator
from dusty_gan_v2_tpu.models.dusty_v2 import circular_translate_w

RES = (16, 128)  # small for test speed; same aspect family as 64x512

G_CFG_V2 = {
    "arch": "dusty_v2",
    "mapping_kwargs": {"in_ch": 64, "out_ch": 64, "depth": 2},
    "synthesis_kwargs": {
        "in_ch": 64,
        "out_ch": (
            {"name": "image", "ch": 1, "act": "tanh"},
            {"name": "raydrop_logit", "ch": 1, "act": None},
        ),
        "ch_base": 8,
        "ch_max": 64,
        "resolution": RES,
        "layers": (2, 2, 2, 2),
        "ring": True,
        "use_noise": False,
        "pe_type": "random",
        "pe_scale_offset": (3, -1),
        "aug_coords": True,
        "aug_coords_blitting": False,
    },
    "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
}

D_CFG_V2 = {
    "arch": "dusty_v2",
    "layer_kwargs": {
        "in_ch": 1,
        "ring": True,
        "ch_base": 8,
        "ch_max": 64,
        "resolution": RES,
        "mbdis_group": 4,
        "mbdis_feat": 1,
        "num_fp16_layers": -1,
        "pre_blur": True,
    },
}


def make_angle(res):
    elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
    azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
    grid = np.stack(np.meshgrid(elev, azim, indexing="ij"), axis=0)[None]
    return jnp.asarray(grid)


@pytest.fixture(scope="module")
def g_v2():
    G = build_generator(G_CFG_V2)
    z = jnp.zeros((2, 64))
    angle = make_angle(RES)
    variables = G.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        z,
        angle,
    )
    return G, variables, angle


class TestDustyV2Generator:
    def test_eval_forward_shapes(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        o = G.apply(
            variables, z, angle, rngs={"gumbel": jax.random.PRNGKey(3)},
            truncation_psi=0.7,
        )
        assert o["image"].shape == (2, 1, *RES)
        assert o["raydrop_logit"].shape == (2, 1, *RES)
        assert o["raydrop_mask"].shape == (2, 1, *RES)
        assert o["image_orig"].shape == (2, 1, *RES)
        assert o["w"].shape == (2, 10, 64)
        img = np.asarray(o["image"])
        mask = np.asarray(o["raydrop_mask"])
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        # dropped rays are exactly the raydrop_const
        assert np.allclose(img[mask == 0], -1.0)
        assert np.abs(img).max() <= 1.0

    def test_train_forward_updates_stats(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        o, new_state = G.apply(
            variables,
            z,
            angle,
            train=True,
            style_mixing=True,
            rngs={
                "gumbel": jax.random.PRNGKey(3),
                "styles": jax.random.PRNGKey(4),
                "aug": jax.random.PRNGKey(5),
            },
            mutable=["stats"],
        )
        # w_avg moved away from zero
        w_avg = np.asarray(new_state["stats"]["w_avg"])
        assert np.abs(w_avg).max() > 0
        # ema_var buffers updated on every modconv
        flat = jax.tree_util.tree_leaves(new_state["stats"])
        assert len(flat) > 5

    def test_pe_cache_exactness(self, g_v2):
        """The hoisted PE pyramid (return_pe_cache -> pe_cache) is bit-identical
        to the in-call computation, in eval and in train (azim_shift rotation
        coefficients still computed per sample from the frozen freqs)."""
        G, variables, angle = g_v2
        cache = G.apply(variables, None, angle, return_pe_cache=True)
        assert isinstance(cache, tuple) and cache[0] is not None
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        noise = jax.random.logistic(jax.random.PRNGKey(7), (2, 1, *RES))
        o_ref = G.apply(variables, z, angle, truncation_psi=0.7, gumbel_noise=noise)
        o_cached = G.apply(variables, z, angle, truncation_psi=0.7,
                           gumbel_noise=noise, pe_cache=cache)
        for k in ("image", "raydrop_logit", "w"):
            np.testing.assert_array_equal(np.asarray(o_ref[k]), np.asarray(o_cached[k]))

        rngs = {"gumbel": jax.random.PRNGKey(3), "styles": jax.random.PRNGKey(4),
                "aug": jax.random.PRNGKey(5)}
        o_t, st_t = G.apply(variables, z, angle, train=True, rngs=rngs,
                            mutable=["stats"])
        o_tc, st_tc = G.apply(variables, z, angle, train=True, rngs=rngs,
                              mutable=["stats"], pe_cache=cache)
        np.testing.assert_array_equal(np.asarray(o_t["image"]), np.asarray(o_tc["image"]))
        for a, b in zip(jax.tree_util.tree_leaves(st_t),
                        jax.tree_util.tree_leaves(st_tc)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_truncation_psi(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        noise = jnp.zeros((2, 1, *RES))
        o1 = G.apply(variables, z, angle, truncation_psi=1.0, gumbel_noise=noise)
        o0 = G.apply(variables, z, angle, truncation_psi=0.0, gumbel_noise=noise)
        # psi=0 collapses styles to w_avg (zeros initially) -> ws all equal
        assert np.allclose(np.asarray(o0["w"]), np.asarray(o0["w"][0:1]))
        assert not np.allclose(np.asarray(o1["image"]), np.asarray(o0["image"]))

    def test_style_mixing_crossover(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(7), (4, 64))
        o, _ = G.apply(
            variables, z, angle, train=True, style_mixing=True,
            rngs={
                "gumbel": jax.random.PRNGKey(3),
                "styles": jax.random.PRNGKey(4),
                "aug": jax.random.PRNGKey(5),
            },
            mutable=["stats"],
        )
        w = np.asarray(o["w"])  # (B, 10, D)
        # styles take at most two distinct values per batch element
        for b in range(w.shape[0]):
            uniq = np.unique(w[b], axis=0)
            assert uniq.shape[0] <= 2

    def test_input_w(self, g_v2):
        G, variables, angle = g_v2
        w = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 64))
        noise = jnp.zeros((2, 1, *RES))
        o = G.apply(variables, w, angle, input_w=True, gumbel_noise=noise)
        np.testing.assert_allclose(np.asarray(o["w"]), np.asarray(w))

    def test_deterministic_gumbel(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        noise = jax.random.normal(jax.random.PRNGKey(9), (2, 1, *RES))
        o1 = G.apply(variables, z, angle, gumbel_noise=noise)
        o2 = G.apply(variables, z, angle, gumbel_noise=noise)
        np.testing.assert_array_equal(np.asarray(o1["image"]), np.asarray(o2["image"]))


class TestDustyV2Discriminator:
    def test_logit_shape(self):
        D = build_discriminator(D_CFG_V2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, *RES))
        variables = D.init(jax.random.PRNGKey(1), x)
        y = D.apply(variables, x)
        assert y.shape == (4, 1)

    def test_grad_wrt_input(self):
        # R1 penalty needs d logits / d image
        D = build_discriminator(D_CFG_V2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, *RES))
        variables = D.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda x: jnp.sum(D.apply(variables, x)))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestVanilla:
    RES_V = (64, 128)  # vanilla projects to res/16; H must be >= 64 for reflect pads

    def test_generator_and_discriminator(self):
        g_cfg = {
            "arch": "vanilla",
            "synthesis_kwargs": {
                "in_ch": 64,
                "out_ch": ({"name": "image", "ch": 1, "act": None},),
                "ch_base": 8,
                "ch_max": 64,
                "resolution": self.RES_V,
                "ring": True,
            },
        }
        G = build_generator(g_cfg)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
        variables = G.init(jax.random.PRNGKey(1), z)
        o = G.apply(variables, z)
        assert o["image"].shape == (2, 1, *self.RES_V)
        assert o["w"].shape == (2, 1, 64)

        D = build_discriminator(
            {
                "arch": "vanilla",
                "layer_kwargs": {
                    "in_ch": 1,
                    "ring": True,
                    "ch_base": 8,
                    "ch_max": 64,
                    "resolution": self.RES_V,
                },
            }
        )
        dv = D.init(jax.random.PRNGKey(2), o["image"])
        y = D.apply(dv, o["image"])
        assert y.shape == (2, 1, 1, 1)

    def test_dusty_v1(self):
        g_cfg = {
            "arch": "dusty_v1",
            "synthesis_kwargs": {
                "in_ch": 64,
                "out_ch": (
                    {"name": "image", "ch": 1, "act": None},
                    {"name": "raydrop_logit", "ch": 1, "act": None},
                ),
                "ch_base": 8,
                "ch_max": 64,
                "resolution": self.RES_V,
                "ring": True,
            },
            "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
        }
        G = build_generator(g_cfg)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
        variables = G.init(
            {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}, z
        )
        o = G.apply(variables, z, rngs={"gumbel": jax.random.PRNGKey(3)})
        assert set(o) >= {"image", "image_orig", "raydrop_logit", "raydrop_mask", "w"}


class TestCircularTranslate:
    @pytest.mark.parametrize("delta_frac", [0.0, 0.25, 0.73, 0.999])
    def test_matches_torch_grid_sample(self, delta_frac):
        """Oracle: the reference's circular-cat + affine grid_sample inverse shift."""
        B, C, H, W = 2, 3, 4, 16
        rng = np.random.RandomState(0)
        x = rng.randn(B, C, H, W).astype(np.float32)
        shift01 = np.array([delta_frac, 0.1], np.float32)  # per-sample in [0,1)

        # torch oracle (dusty_v2.py:252-297 semantics)
        v = torch.from_numpy(x)
        v2 = torch.cat([v, v], dim=3)
        t = torch.zeros(B, 2)
        t[:, 1] = torch.from_numpy(shift01)  # [h, w] in turns
        mat = torch.eye(3)[None].repeat(B, 1, 1)
        mat[:, 0, 2] = t[:, 1]
        grid = F.affine_grid(mat[:, :2], v2.shape, align_corners=False)
        ref = F.grid_sample(v2, grid, mode="bilinear", align_corners=False)[..., :W]

        delta = jnp.asarray(shift01) * W
        got = circular_translate_w(jnp.asarray(x), delta)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)

    def test_identity_when_zero(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 2, 8).astype(np.float32))
        got = circular_translate_w(x, jnp.zeros((1,)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(x))


class TestAzimShiftIdentity:
    """The train-time azimuth shift is applied inside the Fourier encoding via a trig
    identity; verify it equals shifting the angle grid directly."""

    def test_pe_shift_equivalence(self):
        from dusty_gan_v2_tpu.ops import FourierFeature

        res = (8, 64)
        ff = FourierFeature(resolution=res, num_freqs=64)
        angle = make_angle(res)  # (1,2,H,W)
        variables = ff.init(jax.random.PRNGKey(0), angle)
        shift = jnp.asarray([0.7, 2.1, 5.9])
        B = shift.shape[0]
        # direct: shift the azimuth channel of a per-sample grid
        angle_b = jnp.broadcast_to(angle, (B, 2, *res))
        angle_shifted = angle_b.at[:, 1].add(shift[:, None, None])
        ref = ff.apply(variables, angle_shifted)
        # identity path: batch-1 grid + per-sample shift
        got = ff.apply(variables, angle, azim_shift=shift)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_pyramid_commutes_with_shift(self):
        from dusty_gan_v2_tpu.models.dusty_v2 import downsample_angle
        from dusty_gan_v2_tpu.ops import make_resample

        res = (16, 128)
        angle = make_angle(res)
        plan = make_resample(down=2, window=(1, 3, 3, 1), ring=True)
        shift = 1.234
        down_then_shift = downsample_angle(angle, plan).at[:, 1].add(shift)
        shifted = angle.at[:, 1].add(shift)
        shift_then_down = downsample_angle(shifted, plan)
        # equal modulo 2*pi (atan2 wraps)
        d = np.asarray(jnp.sin(down_then_shift - shift_then_down))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_split_contraction_with_rotation_equals_materialized(self):
        """ModConv2d(x, x_shared=pe, shared_rotation) must equal the plain path on
        concat(x, pe_shifted): the azimuth shift folded into the weight columns is
        an exact reformulation (orthogonal rotation commutes with demodulation),
        and so is the split contraction; the ema_var statistic must match too."""
        from dusty_gan_v2_tpu.ops import FourierFeature, ModConv2d

        res = (8, 32)
        B, Cx, n_freqs = 3, 5, 64
        rng = np.random.RandomState(0)
        ff = FourierFeature(resolution=res, num_freqs=n_freqs)
        angle = make_angle(res)
        ffv = ff.init(jax.random.PRNGKey(0), angle)
        shift = jnp.asarray([0.7, 2.1, 5.9])
        pe_base, (sd, cd) = ff.apply(ffv, angle, azim_shift=shift, as_rotation=True)
        pe_shifted = ff.apply(ffv, angle, azim_shift=shift)  # (B, 2n, H, W)

        mc = ModConv2d(
            in_ch=Cx + 2 * (n_freqs // 2), out_ch=7, mod_ch=16, ksize=1, stride=1,
            padding=0, use_bias=False, ema=True,
        )
        x = jnp.asarray(rng.randn(B, Cx, *res).astype(np.float32))
        style = jnp.asarray(rng.randn(B, 16).astype(np.float32))
        xcat = jnp.concatenate([x, pe_shifted], axis=1)
        mv = mc.init(jax.random.PRNGKey(1), xcat, style)

        ref, mref = mc.apply(mv, xcat, style, train=True, mutable=["stats"])
        got, mgot = mc.apply(
            mv, x, style, train=True, x_shared=pe_base, shared_rotation=(sd, cd),
            mutable=["stats"],
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(
            float(mgot["stats"]["ema_var"]), float(mref["stats"]["ema_var"]),
            rtol=1e-5,
        )

    def test_split_contraction_pe_only(self):
        """First-block case: x=None, input is entirely the shared PE."""
        from dusty_gan_v2_tpu.ops import FourierFeature, ModConv2d

        res = (4, 16)
        n_freqs = 32
        ff = FourierFeature(resolution=res, num_freqs=n_freqs)
        angle = make_angle(res)
        ffv = ff.init(jax.random.PRNGKey(0), angle)
        pe = ff.apply(ffv, angle)  # (1, 2n, H, W)
        B = 4
        style = jnp.asarray(np.random.RandomState(1).randn(B, 8).astype(np.float32))
        mc = ModConv2d(
            in_ch=2 * (n_freqs // 2), out_ch=6, mod_ch=8, ksize=1, stride=1,
            padding=0, use_bias=False, ema=True,
        )
        peb = jnp.broadcast_to(pe, (B, *pe.shape[1:]))
        mv = mc.init(jax.random.PRNGKey(2), peb, style)
        ref = mc.apply(mv, peb, style)
        got = mc.apply(mv, None, style, x_shared=pe)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_train_forward_still_works(self, g_v2):
        G, variables, angle = g_v2
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
        o, _ = G.apply(
            variables, z, angle, train=True,
            rngs={"gumbel": jax.random.PRNGKey(3), "aug": jax.random.PRNGKey(5),
                  "styles": jax.random.PRNGKey(4)},
            mutable=["stats"],
        )
        assert np.isfinite(np.asarray(o["image"])).all()


class TestRemat:
    def test_forward_and_grad_match_non_remat(self):
        """nn.checkpoint'd blocks must be numerically identical (fwd + grad)."""
        import copy

        from dusty_gan_v2_tpu.models import build_discriminator, build_generator

        res = (8, 64)
        gcfg = {
            "arch": "dusty_v2",
            "mapping_kwargs": {"in_ch": 16, "out_ch": 16, "depth": 2},
            "synthesis_kwargs": {
                "in_ch": 16,
                "out_ch": ({"name": "image", "ch": 1, "act": "tanh"},
                           {"name": "raydrop_logit", "ch": 1, "act": None}),
                "ch_base": 4, "ch_max": 16, "resolution": res, "layers": (2, 2),
                "ring": True, "use_noise": False, "aug_coords": True,
            },
            "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
        }
        gcfg_r = copy.deepcopy(gcfg)
        gcfg_r["synthesis_kwargs"]["remat"] = True
        G0, G1 = build_generator(gcfg), build_generator(gcfg_r)

        elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
        azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
        angle = jnp.asarray(np.stack(np.meshgrid(elev, azim, indexing="ij"), 0)[None])
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        gn = jnp.zeros((2, 1, *res))
        v = G0.init({"params": jax.random.PRNGKey(0),
                     "gumbel": jax.random.PRNGKey(1)}, z, angle)

        def loss(G, vv):
            k = jax.random.PRNGKey(3)
            o, _ = G.apply(vv, z, angle, train=True, gumbel_noise=gn,
                           rngs={"gumbel": k, "noise": k, "styles": k, "aug": k},
                           mutable=["stats"])
            return jnp.sum(o["image"] ** 2)

        g0 = jax.grad(lambda vv: loss(G0, vv))(v)
        g1 = jax.grad(lambda vv: loss(G1, vv))(v)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        dcfg = {"arch": "dusty_v2", "layer_kwargs": {
            "in_ch": 1, "ring": True, "ch_base": 4, "ch_max": 16,
            "resolution": res, "mbdis_group": 2, "mbdis_feat": 1, "pre_blur": True,
        }}
        dcfg_r = copy.deepcopy(dcfg)
        dcfg_r["layer_kwargs"]["remat"] = True
        D0, D1 = build_discriminator(dcfg), build_discriminator(dcfg_r)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 1, *res))
        dv = D0.init(jax.random.PRNGKey(0), x)
        d0 = jax.grad(lambda xx: jnp.sum(D0.apply(dv, xx) ** 2))(x)
        d1 = jax.grad(lambda xx: jnp.sum(D1.apply(dv, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)
