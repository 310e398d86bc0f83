"""Fabricate a sim2real semseg dataset in the release's exact on-disk layout.

Same frame formats as the real release (reference semseg/datasets/sqsg.py:37-57
KITTIRawFrontal (64,512,6)=(x,y,z,intensity,depth,label) .npy + ImageSet split
txts; :117-134 GTALiDAR (64,512,5) frames under GTAV/<seq>/ with per-frame GAN
drop maps under GTAV_noise_v2/ at the training shape), at full sensor size, big
enough to drive the production train_semseg.py / test_semseg.py CLIs on TPU for
real throughput measurements when the release data is unavailable (zero-egress
env). Data VALUES are synthetic; the pipeline and its wall-clock are real.

    python scripts/make_synthetic_semseg.py --root /tmp/semseg_synth \
        [--gta 2000] [--frontal 512] [--shape 64 512]
"""

import argparse
from pathlib import Path

import numpy as np

H0, W0 = 64, 512  # release frame shape


def frontal_frame(rng):
    """(64,512,6): x,y,z,intensity,depth,label — plausible stats + dropped rays
    (structured like tests/test_semseg_e2e.py's fixtures, at scale)."""
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


def gta_frame(rng):
    """(64,512,5): x,y,z,depth,label (no intensity, reference sqsg.py:128)."""
    f = frontal_frame(rng)
    return np.concatenate([f[..., :3], f[..., 4:5], f[..., 5:6] % 3], axis=-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--gta", type=int, default=2000)
    p.add_argument("--frontal", type=int, default=512)
    p.add_argument("--shape", type=int, nargs=2, default=(64, 512),
                   help="training shape the GAN drop maps are stored at")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    root = Path(args.root)

    (root / "lidar_2d").mkdir(parents=True, exist_ok=True)
    (root / "ImageSet").mkdir(exist_ok=True)
    names = [f"2011_09_26_drive_0001_{i:010d}" for i in range(args.frontal)]
    for n in names:
        np.save(root / "lidar_2d" / f"{n}.npy", frontal_frame(rng))
    n_tr = int(args.frontal * 0.75)
    (root / "ImageSet" / "train.txt").write_text("\n".join(names[:n_tr]) + "\n")
    (root / "ImageSet" / "val.txt").write_text("\n".join(names[n_tr:]) + "\n")
    (root / "ImageSet" / "all.txt").write_text("\n".join(names) + "\n")
    print(f"{args.frontal} frontal frames (train {n_tr} / val {args.frontal - n_tr})")

    (root / "GTAV" / "seq0").mkdir(parents=True, exist_ok=True)
    (root / "GTAV_noise_v2" / "seq0").mkdir(parents=True, exist_ok=True)
    sh = tuple(args.shape)
    for i in range(args.gta):
        np.save(root / "GTAV" / "seq0" / f"{i:06d}.npy", gta_frame(rng))
        np.save(root / "GTAV_noise_v2" / "seq0" / f"{i:06d}.npy",
                rng.uniform(0.6, 1.0, sh).astype(np.float32))
    print(f"{args.gta} GTA frames + drop maps at {sh}")


if __name__ == "__main__":
    main()
