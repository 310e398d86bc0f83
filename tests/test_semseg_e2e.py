"""Semseg end-to-end on synthetic fixtures in the release's exact on-disk layout.

Fixture frames follow reference `semseg/datasets/sqsg.py:37-57` (KITTIRawFrontal:
(64,512,6)=(x,y,z,intensity,depth,label) .npy + ImageSet split txts) and :117-134
(GTALiDAR: (64,512,5) frames under GTAV/<seq>/ + per-frame GAN drop maps under
GTAV_noise_v2/). train_semseg runs real SGD steps on them and test_semseg evaluates
the produced checkpoint — the full loop, not --dry_run.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H0, W0 = 64, 512  # release frame shape
SHAPE = (64, 128)  # training shape (W-only strides: H must stay 64)


def load_cli(name):
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}_e2e", os.path.join(_REPO, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _frontal_frame(rng):
    """(64,512,6): x,y,z,intensity,depth,label with plausible stats + dropped rays."""
    depth = rng.uniform(2.0, 60.0, (H0, W0)).astype(np.float32)
    drop = rng.rand(H0, W0) < 0.15
    depth[drop] = 0.0
    azim = np.linspace(np.pi / 4, -np.pi / 4, W0, dtype=np.float32)[None]
    elev = np.linspace(0.03, -0.4, H0, dtype=np.float32)[:, None]
    x = depth * np.cos(elev) * np.cos(azim)
    y = depth * np.cos(elev) * np.sin(azim)
    z = depth * np.sin(elev)
    intensity = rng.rand(H0, W0).astype(np.float32)
    label = rng.randint(0, 4, (H0, W0)).astype(np.float32)
    label[depth == 0] = 0
    return np.stack([x, y, z, intensity, depth, label], axis=-1).astype(np.float32)


def _gta_frame(rng):
    """(64,512,5): x,y,z,depth,label (no intensity, reference sqsg.py:128)."""
    f = _frontal_frame(rng)
    return np.concatenate([f[..., :3], f[..., 4:5], f[..., 5:6] % 3], axis=-1)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw_frontal")
    rng = np.random.RandomState(0)

    (root / "lidar_2d").mkdir()
    (root / "ImageSet").mkdir()
    names = [f"2011_09_26_drive_0001_{i:010d}" for i in range(12)]
    for n in names:
        np.save(root / "lidar_2d" / f"{n}.npy", _frontal_frame(rng))
    (root / "ImageSet" / "train.txt").write_text("\n".join(names[:8]) + "\n")
    (root / "ImageSet" / "val.txt").write_text("\n".join(names[8:]) + "\n")
    (root / "ImageSet" / "all.txt").write_text("\n".join(names) + "\n")

    (root / "GTAV" / "seq0").mkdir(parents=True)
    (root / "GTAV_noise_v2" / "seq0").mkdir(parents=True)
    for i in range(8):
        np.save(root / "GTAV" / "seq0" / f"{i:06d}.npy", _gta_frame(rng))
        # GAN drop maps are stored at the *training* shape (reference applies them
        # to the resized mask without resampling, sqsg.py:209-213)
        np.save(root / "GTAV_noise_v2" / "seq0" / f"{i:06d}.npy",
                rng.uniform(0.6, 1.0, SHAPE).astype(np.float32))
    return root


def _write_cfg(tmp_path, root, inputs="[xyz, depth]", max_steps=2):
    cfg = f"""
arch:
  name: squeezeseg_v2
  inputs: {inputs}
  bn_momentum: 0.001
  pretrained_weights: false
  encoder: {{dropout_p: 0.5}}
  decoder: {{dropout_p: 0.5}}
  use_crf: false
dataset:
  name: gta_lidar_w_gan_noise_dustyv2
  root: {root}
  num_classes: 3
  logit_bias: [0.01, 0.33, 0.33]
  scan_unfolding: true
  shape: [{SHAPE[0]}, {SHAPE[1]}]
  random_flip: true
loss:
  name: focal_loss
  focal_gamma: 2
  cls_loss_coef: 15.0
  cls_weight: [0.33, 1.0, 3.5]
training:
  max_steps: {max_steps}
  lr: 0.05
  lr_momentum: 0.9
  lr_decay: 0.5
  lr_decay_steps: 10000
  weight_decay: 0.0001
  max_grad_norm: 1.0
  batch_size: 8
  checkpoint: {{test: 2, stats: 1, image: 2}}
random_seed: 0
"""
    p = tmp_path / "e2e.yaml"
    p.write_text(cfg)
    return p


def test_train_with_mask_input(fixture_root, tmp_path, monkeypatch):
    """'mask' as a declared input modality (MODALITY_CH) must train: it ships as a
    3-D uint8 plane and the in-step concat re-expands it (regression: the CLI once
    overwrote the expanded copy with the raw 3-D mask -> rank mismatch at trace)."""
    log_dir = tmp_path / "logs_mask"
    cfg_path = _write_cfg(
        tmp_path, fixture_root, inputs="[depth, mask]", max_steps=1
    )

    train_mod = load_cli("train_semseg")
    monkeypatch.setattr(sys, "argv", [
        "train_semseg.py", "--config", str(cfg_path),
        "--log_dir", str(log_dir), "--num_workers", "2",
    ])
    train_mod.main()
    assert sorted((log_dir / "models").glob("*.ckpt")), "no checkpoint written"


def test_train_then_eval(fixture_root, tmp_path, monkeypatch, capsys):
    log_dir = tmp_path / "logs"
    cfg_path = _write_cfg(tmp_path, fixture_root)

    train_mod = load_cli("train_semseg")
    monkeypatch.setattr(sys, "argv", [
        "train_semseg.py", "--config", str(cfg_path),
        "--log_dir", str(log_dir), "--num_workers", "2",
    ])
    train_mod.main()

    ckpts = sorted((log_dir / "models").glob("*.ckpt"))
    assert ckpts, "no checkpoint written by train_semseg"

    test_mod = load_cli("test_semseg")
    out_json = tmp_path / "scores.json"
    monkeypatch.setattr(sys, "argv", [
        "test_semseg.py", "--ckpt_path", str(ckpts[-1]),
        "--dataset_root", str(fixture_root),
        "--batch_size", "4", "--knn", "--out", str(out_json),
    ])
    test_mod.main()

    import json

    scores = json.loads(out_json.read_text())
    assert len(scores["iou"]) == 3
    assert all(0.0 <= v <= 1.0 for v in scores["iou"])
    printed = capsys.readouterr().out
    assert "mean" in printed
