"""CLI smoke tests (in-process, tiny configs, synthetic data)."""

import json
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


@pytest.fixture()
def tiny_ckpt(tmp_path):
    from test_trainer import RES, make_angle, tiny_cfg

    from dusty_gan_v2_tpu.parallel import make_mesh
    from dusty_gan_v2_tpu.training import Trainer
    from dusty_gan_v2_tpu.training.checkpoint import save_checkpoint

    mesh = make_mesh(jax.devices()[:1])
    cfg = tiny_cfg()
    cfg.training.batch_size = 4
    cfg.validation = {"batch_size": 4, "num_points": 64}
    t = Trainer(cfg, mesh=mesh, angle=make_angle(RES))
    state = t.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "tiny.ckpt")
    save_checkpoint(path, cfg, state, t.angle, num_imgs=0)
    return path


class TestQuickDemo:
    def test_main(self, tiny_ckpt, tmp_path, monkeypatch):
        import quick_demo

        out = str(tmp_path / "demo.png")
        monkeypatch.setattr(
            sys, "argv",
            ["quick_demo.py", "--ckpt_path", tiny_ckpt, "--batch_size", "2",
             "--out", out],
        )
        quick_demo.main()
        import os

        assert os.path.exists(out)


class TestTrainGanDryRun:
    def test_dry_run(self, monkeypatch, capsys):
        import train_gan

        monkeypatch.setattr(
            sys, "argv",
            ["train_gan.py", "--config", "configs/gans/dusty_v2.yaml", "--dry_run"],
        )
        train_gan.main()
        out = capsys.readouterr().out
        cfg = json.loads(out)
        assert cfg["model"]["generator"]["arch"] == "dusty_v2"

    def test_semseg_dry_run(self, monkeypatch, capsys):
        import train_semseg

        monkeypatch.setattr(
            sys, "argv",
            ["train_semseg.py", "--config",
             "configs/semseg/sim2real_w_gan_noise_dustyv2.yaml", "--dry_run"],
        )
        train_semseg.main()
        out = capsys.readouterr().out
        assert json.loads(out)["arch"]["name"] == "squeezeseg_v2"


class TestDemoInterpolation:
    def test_2d_gif(self, tiny_ckpt, tmp_path, monkeypatch):
        import demo_interpolation

        out = str(tmp_path / "interp.gif")
        monkeypatch.setattr(
            sys, "argv",
            ["demo_interpolation.py", "--ckpt_path", tiny_ckpt, "--mode", "2d",
             "--num_anchors", "2", "--frames_per_anchor", "2", "--out", out],
        )
        demo_interpolation.main()
        import os

        assert os.path.exists(out)
