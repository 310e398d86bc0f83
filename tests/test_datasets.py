"""Dataset tests: scan unfolding, z-buffering, sampler semantics — against a literal
python formulation of the reference algorithm (kitti.py:216-370) as oracle."""

import os
import numpy as np
import pytest

from dusty_gan_v2_tpu.datasets.kitti import (
    InfiniteSampler,
    KITTIRaw,
    Prefetcher,
    nearest_resize_hw,
    project_points_to_image,
)

RNG = np.random.RandomState(0)


def synthetic_scan(H=8, W=32, n_extra=50):
    """Counterclockwise-ordered rings (top ring first), like a spinning LiDAR."""
    pts = []
    for ring in range(H):
        elev = np.deg2rad(3 - 28 * ring / (H - 1))
        # start just inside the 1st quadrant, wrap through 2nd,3rd,4th
        phis = np.linspace(0.01, 2 * np.pi - 0.01, W)
        r = RNG.uniform(5, 50, W)
        x = r * np.cos(elev) * np.cos(phis)
        y = r * np.cos(elev) * np.sin(phis)
        z = r * np.sin(elev)
        i = RNG.rand(W)
        pts.append(np.stack([x, y, z, i], axis=1))
    return np.concatenate(pts).astype(np.float32)


def oracle_project(points, H, W, min_depth, max_depth, scan_unfolding=True):
    """Literal reference algorithm (python loops)."""
    xyz = points[:, :3]
    x, y, z = xyz[:, [0]], xyz[:, [1]], xyz[:, [2]]
    depth = np.linalg.norm(xyz, ord=2, axis=1, keepdims=True)
    mask = (depth >= min_depth) & (depth <= max_depth)
    feats = np.concatenate([points, depth, mask], axis=1)

    if scan_unfolding:
        quads = np.zeros_like(x, dtype=np.int32)
        quads[(x >= 0) & (y >= 0)] = 0
        quads[(x < 0) & (y >= 0)] = 1
        quads[(x < 0) & (y < 0)] = 2
        quads[(x >= 0) & (y < 0)] = 3
        diff = np.roll(quads, shift=1, axis=0) - quads
        delim_inds, _ = np.where(diff == 3)
        inds = list(delim_inds) + [len(points)]
        grid_h = np.zeros_like(x, dtype=np.int32)
        cur = H - 1
        for i in reversed(range(len(delim_inds))):
            grid_h[inds[i] : inds[i + 1]] = cur
            if cur >= 0:
                cur -= 1
            else:
                break
    else:
        fup, fdown = np.deg2rad(3), np.deg2rad(-25)
        pitch = np.arcsin(z / depth) + abs(fdown)
        grid_h = np.floor((1 - pitch / (fup - fdown)) * H).clip(0, H - 1).astype(np.int32)

    yaw = -np.arctan2(y, x)
    grid_w = np.floor(((yaw / np.pi + 1) / 2 % 1) * W).clip(0, W - 1).astype(np.int32)
    grid = np.concatenate((grid_h.reshape(-1, 1), grid_w.reshape(-1, 1)), axis=1)

    order = np.argsort(-depth.squeeze(1), kind="stable")
    proj = np.zeros((H, W, 6), dtype=feats.dtype)
    for (h, w), v in zip(grid[order], feats[order]):
        proj[h, w] = v
    return proj


class TestProjection:
    @pytest.mark.parametrize("scan_unfolding", [True, False])
    def test_matches_reference_oracle(self, scan_unfolding):
        pts = synthetic_scan(H=8, W=32)
        H, W = 8, 64
        got = project_points_to_image(
            pts, H=H, W=W, min_depth=1.45, max_depth=80.0, scan_unfolding=scan_unfolding
        )
        ref = oracle_project(pts, H, W, 1.45, 80.0, scan_unfolding)
        # tie-breaking for identical depths may differ; compare depth channel and
        # near-equality elsewhere
        np.testing.assert_allclose(got[..., 4], ref[..., 4], atol=1e-5)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_ring_recovery(self):
        H, W = 8, 32
        pts = synthetic_scan(H=H, W=W)
        img = project_points_to_image(pts, H=H, W=W * 2, min_depth=1.0, max_depth=100.0)
        # every ring row should be mostly populated (scan unfolding found all rings)
        fill = (img[..., 5] > 0).mean(axis=1)
        assert (fill > 0.4).all(), fill

    def test_zbuffer_keeps_nearest(self):
        # two points mapping to the same cell: the nearer must win
        p_far = [10.0, 0.01, 0.0, 0.5]
        p_near = [5.0, 0.005, 0.0, 0.9]
        pts = np.array([p_far, p_near], np.float32)
        img = project_points_to_image(pts, H=4, W=8, min_depth=1.0, max_depth=100.0,
                                      scan_unfolding=False)
        filled = img[img[..., 5] > 0]
        assert len(filled) == 1
        assert filled[0, 4] == pytest.approx(5.0, rel=1e-5)

    def test_nearest_resize(self):
        img = RNG.randn(8, 32, 3).astype(np.float32)
        out = nearest_resize_hw(img, (8, 16))
        np.testing.assert_array_equal(out, img[:, ::2])


class TestKITTIRaw:
    def test_end_to_end_synthetic_files(self, tmp_path):
        # fabricate a mini kitti_raw tree matching the val split layout
        seq = "2011_09_30_drive_0028_sync"
        d = tmp_path / seq[:10] / seq / "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(1100, 1103):
            synthetic_scan(H=16, W=64).tofile(d / f"{i:010d}.bin")
        ds = KITTIRaw(root=str(tmp_path), split="val", shape=(16, 128),
                      min_depth=1.45, max_depth=80.0)
        assert len(ds) == 4071  # full val index list (files may be missing on disk)
        item = ds[0]
        assert item["depth"].shape == (1, 16, 128)
        assert item["mask"].shape == (1, 16, 128)
        assert set(np.unique(item["mask"])).issubset({0.0, 1.0})
        # masked cells are zero in all channels
        assert (item["depth"][item["mask"] == 0] == 0).all()

    def test_ram_cache_identical(self, tmp_path):
        """cache="ram" returns byte-identical frames and skips the reload."""
        seq = "2011_09_30_drive_0028_sync"
        d = tmp_path / seq[:10] / seq / "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(1100, 1102):
            synthetic_scan(H=16, W=64).tofile(d / f"{i:010d}.bin")
        kw = dict(root=str(tmp_path), split="val", shape=(16, 128),
                  min_depth=1.45, max_depth=80.0)
        plain = KITTIRaw(**kw)
        cached = KITTIRaw(cache="ram", **kw)
        for idx in (0, 1, 0):
            a, b = plain[idx], cached[idx]
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        assert set(cached._cache) == {0, 1}
        # cache hit must not touch the file again
        os.rename(cached.datalist[0], cached.datalist[0] + ".gone")
        try:
            item = cached[0]
            assert item["depth"].shape == (1, 16, 128)
        finally:
            os.rename(cached.datalist[0] + ".gone", cached.datalist[0])


class TestInfiniteSampler:
    def test_rank_sharding_partitions(self):
        n = 13
        iters = [iter(InfiniteSampler(n, rank=r, num_replicas=4, seed=1)) for r in range(4)]
        seen = [next(it) for it in iters for _ in range(1)]
        # all yields valid indices, infinite
        out = [next(iters[0]) for _ in range(100)]
        assert all(0 <= i < n for i in out)
        # covers the dataset eventually
        assert len(set(out)) > n // 2

    def test_no_shuffle_order(self):
        it = iter(InfiniteSampler(5, shuffle=False))
        assert [next(it) for _ in range(7)] == [0, 1, 2, 3, 4, 0, 1]


class TestPrefetcher:
    def test_batches(self):
        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"a": np.full((2, 2), i, np.float32)}

        loader = Prefetcher(DS(), batch_size=4, num_workers=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["a"].shape == (4, 2, 2)
        assert batches[-1]["a"].shape == (2, 2, 2)

    def test_infinite(self):
        class DS:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return {"a": np.float32(i)}

        loader = Prefetcher(DS(), batch_size=4, sampler=InfiniteSampler(6, seed=0))
        it = iter(loader)
        for _ in range(5):
            b = next(it)
            assert b["a"].shape == (4,)


class TestNativeLoader:
    def test_native_matches_numpy(self):
        from dusty_gan_v2_tpu.datasets.native import (
            available,
            nearest_resize_native,
            project_points_to_image_native,
        )

        if not available():
            import pytest

            pytest.skip("native library unavailable")
        pts = synthetic_scan(H=8, W=32)
        ref = project_points_to_image(pts, H=8, W=64, min_depth=1.45, max_depth=80.0)
        got = project_points_to_image_native(pts, 8, 64, 1.45, 80.0, True)
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # pitch-binning path
        ref2 = project_points_to_image(pts, H=8, W=64, min_depth=1.45, max_depth=80.0,
                                       scan_unfolding=False)
        got2 = project_points_to_image_native(pts, 8, 64, 1.45, 80.0, False)
        np.testing.assert_allclose(got2, ref2, atol=1e-5)

        img = RNG.randn(8, 32, 3).astype(np.float32)
        np.testing.assert_array_equal(
            nearest_resize_native(img, (8, 16)), nearest_resize_hw(img, (8, 16))
        )

    def test_native_throughput_advantage(self):
        """The native path should not be slower than numpy (informational)."""
        import time

        from dusty_gan_v2_tpu.datasets.native import (
            available,
            project_points_to_image_native,
        )

        if not available():
            import pytest

            pytest.skip("native library unavailable")
        pts = np.concatenate([synthetic_scan(H=64, W=2000) for _ in range(1)])
        t0 = time.perf_counter()
        for _ in range(3):
            project_points_to_image_native(pts, 64, 2048, 1.45, 80.0, True)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            project_points_to_image(pts, H=64, W=2048, min_depth=1.45, max_depth=80.0)
        t_numpy = time.perf_counter() - t0
        print(f"native {t_native:.4f}s vs numpy {t_numpy:.4f}s")
        assert t_native < t_numpy * 2.0  # sanity; usually much faster


class TestDevicePrefetcher:
    def test_keeps_depth_ahead_and_drains(self):
        from dusty_gan_v2_tpu.datasets.kitti import DevicePrefetcher

        uploaded = []

        def put(x):
            uploaded.append(x)
            return x * 10

        it = DevicePrefetcher(iter(range(5)), put, depth=2)
        first = next(it)
        assert first == 0
        assert uploaded == [0, 1]  # depth=2 staged before first yield
        assert list(it) == [10, 20, 30, 40]
        import pytest

        with pytest.raises(StopIteration):
            next(it)


class TestPruneMissing:
    def test_train_split_prunes_to_existing_files(self, tmp_path):
        seq = "2011_10_03_drive_0027_sync"  # odometry seq 0 (train split)
        d = tmp_path / seq[:10] / seq / "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(3):
            synthetic_scan(H=8, W=32).tofile(d / f"{i:010d}.bin")
        full = KITTIRaw(root=str(tmp_path), split="train", shape=(8, 32),
                        min_depth=1.45, max_depth=80.0)
        pruned = KITTIRaw(root=str(tmp_path), split="train", shape=(8, 32),
                          min_depth=1.45, max_depth=80.0, prune_missing=True)
        assert len(full) > len(pruned) == 3
        item = pruned[0]
        assert item["depth"].shape == (1, 8, 32)
