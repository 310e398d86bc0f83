"""CLI smoke tests (in-process, tiny configs, synthetic data)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_cli(name):
    """Import one of OUR root-level CLI modules by absolute path (other tests put
    /root/reference on sys.path, which shadows same-named scripts)."""
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}", os.path.join(_REPO, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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
        quick_demo = load_cli("quick_demo")

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
        train_gan = load_cli("train_gan")

        monkeypatch.setattr(
            sys, "argv",
            ["train_gan.py", "--config", "configs/gans/dusty_v2.yaml", "--dry_run"],
        )
        train_gan.main()
        out = capsys.readouterr().out
        cfg = json.loads(out)
        assert cfg["model"]["generator"]["arch"] == "dusty_v2"

    def test_semseg_dry_run(self, monkeypatch, capsys):
        train_semseg = load_cli("train_semseg")

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
        demo_interpolation = load_cli("demo_interpolation")

        out = str(tmp_path / "interp.gif")
        monkeypatch.setattr(
            sys, "argv",
            ["demo_interpolation.py", "--ckpt_path", tiny_ckpt, "--mode", "2d",
             "--num_anchors", "2", "--frames_per_anchor", "2", "--out", out],
        )
        demo_interpolation.main()
        import os

        assert os.path.exists(out)


class TestTestGanGeneration:
    def test_sharded_generation_smoke(self, tiny_ckpt, tmp_path, monkeypatch):
        """test_gan's mesh-sharded generation path (no dataset-dependent metrics):
        50-sample generation must run on the virtual 8-device mesh and write an
        (empty) scores file."""
        test_gan = load_cli("test_gan")

        out = str(tmp_path / "scores.json")
        monkeypatch.setattr(
            sys, "argv",
            ["test_gan.py", "--ckpt_path", tiny_ckpt, "--metrics", "none",
             "--num_samples", "50", "--batch_size", "16", "--out", out],
        )
        test_gan.main()
        assert json.load(open(out)) == {}


class TestDemoInterpolation3D:
    def test_3d_npz_frames(self, tiny_ckpt, tmp_path, monkeypatch):
        demo_interpolation = load_cli("demo_interpolation")

        out = str(tmp_path / "interp3d.npz")
        monkeypatch.setattr(
            sys, "argv",
            ["demo_interpolation.py", "--ckpt_path", tiny_ckpt, "--mode", "3d",
             "--num_anchors", "2", "--frames_per_anchor", "2", "--out", out],
        )
        demo_interpolation.main()
        import os

        import numpy as np

        assert os.path.exists(out)
        frames = np.load(out)
        assert len(frames.files) > 0
