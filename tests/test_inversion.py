"""Inversion-library tests against torch oracles + CLI checkpoint round-trips."""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.inversion import (
    geocross_loss,
    masked_loss,
    multiscale_masked_loss,
    normalize_noise,
    spherical_project,
    stylegan2_lr_schedule,
)

RNG = np.random.RandomState(0)


def torch_masked_loss(ref, gen, mask, relative=True):
    loss = F.l1_loss(ref, gen, reduction="none")
    if relative:
        loss = (loss * mask) / ref.add(1e-11)
    loss = (loss * mask).sum(dim=(1, 2, 3))
    return loss / mask.sum(dim=(1, 2, 3)).add(1e-8)


def torch_msml(gen, ref, mask, level=2):
    """Literal torch port of MultiScaleMaskedLoss (inversion.py:32-78)."""
    blur = torch.tensor([1.0, 2.0, 1.0])
    blur = torch.outer(blur, blur)
    blur = (blur / blur.sum())[None, None]
    ones = torch.ones_like(blur)

    def pad(x):
        x = F.pad(x, (1, 1, 0, 0), mode="circular")
        return F.pad(x, (0, 0, 1, 1), mode="replicate")

    def blurpool(x):
        C = x.shape[1]
        return F.conv2d(pad(x), blur.repeat(C, 1, 1, 1), stride=2, groups=C)

    def update_mask(m):
        c = F.conv2d(pad(m), ones, stride=2)
        norm = 1 / c.masked_fill(c == 0, 1.0) * 9
        new_mask = torch.ones_like(c).masked_fill(c == 0, 0.0)
        return norm, new_mask

    loss = 0
    for _ in range(max(1, level)):
        loss = loss + torch_masked_loss(ref, gen, mask)
        norm, new_mask = update_mask(mask)
        gen = blurpool(gen * mask) * norm
        ref = blurpool(ref * mask) * norm
        mask = new_mask
    return loss


class TestMaskedLosses:
    def test_masked_loss_matches_torch(self):
        ref = np.abs(RNG.randn(2, 1, 8, 16)).astype(np.float32) + 0.1
        gen = np.abs(RNG.randn(2, 1, 8, 16)).astype(np.float32) + 0.1
        mask = (RNG.rand(2, 1, 8, 16) > 0.3).astype(np.float32)
        got = masked_loss(jnp.asarray(ref), jnp.asarray(gen), jnp.asarray(mask))
        want = torch_masked_loss(
            torch.from_numpy(ref), torch.from_numpy(gen), torch.from_numpy(mask)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)

    def test_multiscale_matches_torch(self):
        ref = np.abs(RNG.randn(2, 1, 16, 32)).astype(np.float32) + 0.1
        gen = np.abs(RNG.randn(2, 1, 16, 32)).astype(np.float32) + 0.1
        mask = (RNG.rand(2, 1, 16, 32) > 0.3).astype(np.float32)
        got = multiscale_masked_loss(
            jnp.asarray(gen), jnp.asarray(ref), jnp.asarray(mask), level=3
        )
        want = torch_msml(
            torch.from_numpy(gen), torch.from_numpy(ref), torch.from_numpy(mask), 3
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-5)

    def test_geocross_matches_torch(self):
        lat = RNG.randn(2, 10, 16).astype(np.float32)
        got = geocross_loss(jnp.asarray(lat))
        t = torch.from_numpy(lat)
        B, N, D = t.shape
        X = t.view(B, 1, N, D)
        Y = t.view(B, N, 1, D)
        A = ((X - Y).pow(2).sum(-1) + 1e-9).sqrt()
        Bm = ((X + Y).pow(2).sum(-1) + 1e-9).sqrt()
        Dm = 2 * torch.atan2(A, Bm)
        want = (Dm.pow(2) * Dm).mean((1, 2)) / 8.0
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)

    def test_spherical_projection(self):
        p = jnp.asarray(RNG.randn(3, 16).astype(np.float32)) * 5
        q = spherical_project(p)
        np.testing.assert_allclose(
            np.sqrt(np.mean(np.asarray(q) ** 2, axis=-1)), 1.0, rtol=1e-3
        )

    def test_normalize_noise(self):
        n = [jnp.asarray(RNG.randn(1, 1, 8, 8).astype(np.float32) * 3 + 1)]
        out = normalize_noise(n)
        assert abs(float(jnp.mean(out[0]))) < 1e-5
        assert abs(float(jnp.std(out[0])) - 1) < 1e-4

    def test_lr_schedule_shape(self):
        s = stylegan2_lr_schedule(100)
        vals = [s(i) for i in range(100)]
        assert vals[0] == 0.0
        assert max(vals) == pytest.approx(1.0, abs=1e-6)
        assert vals[99] < 0.05


class TestCheckpointRoundtrip:
    def test_save_load_sample(self, tmp_path):
        sys.path.insert(0, "tests")
        from test_trainer import RES, make_angle, tiny_cfg

        from dusty_gan_v2_tpu.parallel import make_mesh
        from dusty_gan_v2_tpu.pretrained import autoload_ckpt
        from dusty_gan_v2_tpu.training import Trainer
        from dusty_gan_v2_tpu.training.checkpoint import load_checkpoint, save_checkpoint

        mesh = make_mesh(jax.devices()[:1])
        cfg = tiny_cfg()
        cfg.training.batch_size = 4
        t = Trainer(cfg, mesh=mesh, angle=make_angle(RES))
        state = t.init_state(jax.random.PRNGKey(0))
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, cfg, state, t.angle, num_imgs=128)

        cfg2, state2, angle2, n = load_checkpoint(path, state)
        assert n == 128
        assert cfg2.model.generator.arch == "dusty_v2"
        np.testing.assert_allclose(np.asarray(angle2), np.asarray(t.angle))
        a = jax.tree_util.tree_leaves(state.params_G)[0]
        b = jax.tree_util.tree_leaves(state2.params_G)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # autoload path: normalized dict with G_ema vars usable for sampling
        ckpt = autoload_ckpt(path)
        from dusty_gan_v2_tpu.models import build_generator

        G = build_generator(ckpt["cfg"].model.generator)
        z = jnp.zeros((2, t.z_dim))
        o = G.apply(
            ckpt["G_ema"], z, jnp.asarray(ckpt["angle"]),
            gumbel_noise=jnp.zeros((2, 1, *RES)),
        )
        assert o["image"].shape == (2, 1, *RES)

    def test_torch_pth_autoload(self, tmp_path):
        """Round-trip a synthetic reference-format .pth through autoload_ckpt."""
        sys.path.insert(0, "tests")
        from reference_models import load_reference_gans

        REF = load_reference_gans()
        res = (16, 128)
        gen_cfg = {
            "arch": "dusty_v2",
            "mapping_kwargs": {"in_ch": 32, "out_ch": 32, "depth": 2},
            "synthesis_kwargs": {
                "in_ch": 32,
                "out_ch": [
                    {"name": "image", "ch": 1, "act": "nn.Tanh"},
                    {"name": "raydrop_logit", "ch": 1, "act": None},
                ],
                "ch_base": 8, "ch_max": 32, "resolution": list(res),
                "layers": [2, 2, 2, 2], "ring": True, "num_fp16_layers": 0,
                "use_noise": False, "pe_type": "random", "pe_scale_offset": [3, -1],
                "aug_coords": True, "aug_coords_blitting": False,
            },
            "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
        }
        torch.manual_seed(0)
        tG = REF.dusty_v2.Generator(
            mapping_kwargs=gen_cfg["mapping_kwargs"],
            synthesis_kwargs=dict(gen_cfg["synthesis_kwargs"]),
            measurement_kwargs=gen_cfg["measurement_kwargs"],
        ).eval()
        cfg = {
            "dataset": {"name": "kitti_raw", "min_depth": 1.45, "max_depth": 80,
                        "raydrop_const": -1, "root": "data/kitti_raw"},
            "validation": {"num_points": 512, "batch_size": 8},
            "model": {"generator": gen_cfg,
                      "discriminator": {"arch": "dusty_v2", "layer_kwargs": {}}},
        }
        angle = np.random.RandomState(0).randn(1, 2, *res).astype(np.float32) * 0.3
        path = str(tmp_path / "ref.pth")
        torch.save(
            {"cfg": cfg, "angle": torch.from_numpy(angle),
             "G_ema": tG.state_dict()},
            path,
        )
        from dusty_gan_v2_tpu.models import build_generator
        from dusty_gan_v2_tpu.pretrained import autoload_ckpt

        ckpt = autoload_ckpt(path)
        G = build_generator(ckpt["cfg"].model.generator)
        z = np.random.RandomState(1).randn(2, 32).astype(np.float32)
        got = G.apply(
            ckpt["G_ema"], jnp.asarray(z),
            jnp.asarray(np.repeat(angle, 2, 0)),
            gumbel_noise=jnp.zeros((2, 1, *res)),
        )
        with torch.no_grad():
            want = tG(torch.from_numpy(z),
                      angle=torch.from_numpy(np.repeat(angle, 2, 0)))
        np.testing.assert_allclose(
            np.asarray(got["image_orig"]), want["image_orig"].numpy(), atol=1e-4
        )


class TestOrbaxCheckpoint:
    def test_roundtrip_and_dispatch(self, tmp_path):
        """Orbax directory checkpoints: cooperative sharded save + restore through
        both load_checkpoint_orbax and the format-dispatching load_checkpoint."""
        import sys

        sys.path.insert(0, "tests")
        from test_trainer import RES, make_angle, tiny_cfg

        from dusty_gan_v2_tpu.parallel import make_mesh
        from dusty_gan_v2_tpu.training import Trainer
        from dusty_gan_v2_tpu.training.checkpoint import (
            load_checkpoint,
            save_checkpoint_orbax,
            wait_for_checkpoints,
        )

        mesh = make_mesh(jax.devices()[:1])
        cfg = tiny_cfg()
        cfg.training.batch_size = 4
        t = Trainer(cfg, mesh=mesh, angle=make_angle(RES))
        state = t.init_state(jax.random.PRNGKey(0))

        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint_orbax(path, cfg, state, t.angle, num_imgs=123,
                              use_async=True)
        wait_for_checkpoints()

        cfg2, state2, angle2, num_imgs = load_checkpoint(path, state)
        assert num_imgs == 123
        assert cfg2.training.batch_size == 4
        np.testing.assert_array_equal(np.asarray(angle2), np.asarray(t.angle))
        for a, b in zip(jax.tree_util.tree_leaves(state.params_G),
                        jax.tree_util.tree_leaves(state2.params_G)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
