"""Fabricate a KITTI-raw-layout dataset of synthetic spinning-LiDAR scans.

Writes `velodyne_points/data/*.bin` frames (ring-ordered (N,4) float32 point lists,
the format KITTIRaw's scan unfolding expects — reference gans/datasets/kitti.py:223-370)
into train (odometry seq 0) and test (city drive) sequences, at the real sensor size
(64 rings x 2048 azimuth). Used to drive the production train_gan/test_gan CLIs on
TPU when the real KITTI Raw release is unavailable (zero-egress env): model/metric
VALUES are synthetic, the pipeline and its wall-clock are real.

    python scripts/make_synthetic_kitti.py --root /tmp/kitti_synth \
        [--train 512] [--test 512] [--rings 64] [--azimuth 2048]
"""

import argparse
from pathlib import Path

import numpy as np


def synthetic_scan(rng, H, W):
    """Ring-ordered scan with ground plane + boxes + depth noise (structured enough
    for the z-buffer/unfold path to produce KITTI-like range images)."""
    elev = np.deg2rad(3.0 - 28.0 * np.arange(H) / (H - 1))  # top ring ~+3 deg
    phis = np.linspace(0.01, 2 * np.pi - 0.01, W, dtype=np.float32)
    # per-frame scene: sensor height + a few boxes at random bearings/ranges
    h_sensor = rng.uniform(1.6, 2.0)
    boxes = [
        (rng.uniform(0, 2 * np.pi), rng.uniform(0.3, 0.8), rng.uniform(5, 45),
         rng.uniform(1.0, 4.0))
        for _ in range(rng.randint(3, 8))
    ]
    pts = []
    for i in range(H):
        # ground-plane range for downward rays, far clamp for upward
        s = np.sin(elev[i])
        r = np.full(W, 78.0, np.float32)
        if s < -1e-3:
            r[:] = np.clip(-h_sensor / s, 2.0, 78.0)
        for (phi0, width, dist, height) in boxes:
            dphi = np.abs((phis - phi0 + np.pi) % (2 * np.pi) - np.pi)
            hit = (dphi < width / 2) & (dist * np.abs(s) < height)
            r[hit] = np.minimum(r[hit], dist)
        r = r * rng.uniform(0.98, 1.02, W).astype(np.float32)
        x = r * np.cos(elev[i]) * np.cos(phis)
        y = r * np.cos(elev[i]) * np.sin(phis)
        z = r * np.sin(elev[i])
        refl = rng.rand(W).astype(np.float32)
        pts.append(np.stack([x, y, z, refl], axis=1))
    return np.concatenate(pts).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--train", type=int, default=512)
    p.add_argument("--test", type=int, default=512)
    p.add_argument("--rings", type=int, default=64)
    p.add_argument("--azimuth", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    root = Path(args.root)
    rng = np.random.RandomState(args.seed)
    # train: first odometry sequence; test: a city drive outside the trainval split
    # (split tables: dusty_gan_v2_tpu/datasets/kitti.py)
    specs = [("2011_10_03_drive_0027_sync", args.train),
             ("2011_09_26_drive_0001_sync", args.test)]
    for seq, n in specs:
        d = root / seq[:10] / seq / "velodyne_points" / "data"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            synthetic_scan(rng, args.rings, args.azimuth).tofile(d / f"{i:010d}.bin")
        print(f"{seq}: {n} frames at {args.rings}x{args.azimuth}")


if __name__ == "__main__":
    main()
