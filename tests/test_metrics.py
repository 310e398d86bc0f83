"""Metric-suite tests: brute-force/torch oracles + mathematical properties."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.metrics import (
    chamfer_distance,
    compute_cd,
    compute_cov_mmd_1nna,
    compute_dcd,
    compute_emd,
    compute_frechet_distance,
    compute_jsd,
    compute_squared_mmd,
    compute_swd,
    downsample_point_clouds,
    earth_mover_distance,
    furthest_point_sampling,
    init_pointnet_params,
    pointnet_features,
)
from dusty_gan_v2_tpu.metrics.distance import approx_match, pairwise_sqdist
from dusty_gan_v2_tpu.metrics.swd import laplacian_pyramid, pyramid_down, pyramid_up

RNG = np.random.RandomState(0)


class TestChamfer:
    def test_matches_bruteforce(self):
        x = RNG.randn(2, 30, 3).astype(np.float32)
        y = RNG.randn(2, 20, 3).astype(np.float32)
        d1, d2, i1, i2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
        D = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d1), D.min(2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), D.argmin(2))
        np.testing.assert_array_equal(np.asarray(i2), D.argmin(1))

    def test_zero_for_identical(self):
        x = RNG.randn(1, 50, 3).astype(np.float32)
        cd = compute_cd(jnp.asarray(x), jnp.asarray(x))
        assert float(cd[0]) < 1e-5


def oracle_approx_match(xyz1, xyz2):
    """Literal numpy port of approxmatchkernel (earth_mover_distance.cu:3-198)."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        multiL, multiR = 1.0, float(n // m)
    else:
        multiL, multiR = float(m // n), 1.0
    match = np.zeros((B, m, n), np.float32)
    for i in range(B):
        D = ((xyz1[i][:, None] - xyz2[i][None]) ** 2).sum(-1)
        remainL = np.full(n, multiL, np.float64)
        remainR = np.full(m, multiR, np.float64)
        for j in range(7, -2, -1):
            level = -(4.0**j)
            K = np.exp(level * D)
            ratioL = remainL / (1e-9 + K @ remainR)
            sumr = (K.T @ ratioL) * remainR
            consumption = np.minimum(remainR / (sumr + 1e-9), 1.0)
            ratioR = consumption * remainR
            remainR = np.maximum(0.0, remainR - sumr)
            w = K * ratioL[:, None] * ratioR[None]
            match[i] += w.T.astype(np.float32)
            remainL = np.maximum(0.0, remainL - w.sum(1))
    return match


class TestEMD:
    def test_match_against_oracle(self):
        x = RNG.randn(2, 16, 3).astype(np.float32)
        y = RNG.randn(2, 16, 3).astype(np.float32)
        got = np.asarray(approx_match(jnp.asarray(x), jnp.asarray(y)))
        ref = oracle_approx_match(x, y)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_match_is_transport_plan(self):
        x = RNG.randn(1, 32, 3).astype(np.float32)
        y = RNG.randn(1, 32, 3).astype(np.float32)
        match = np.asarray(approx_match(jnp.asarray(x), jnp.asarray(y)))
        # rows/cols transport ~1 unit of mass each (approximate algorithm: small slack)
        assert match.sum(axis=1).max() <= 1.0 + 1e-4
        assert match.sum(axis=2).max() <= 1.0 + 1e-4
        assert match.sum(axis=1).mean() > 0.97
        assert match.sum(axis=2).mean() > 0.97

    def test_zero_for_identical(self):
        x = RNG.randn(1, 64, 3).astype(np.float32)
        emd = compute_emd(jnp.asarray(x), jnp.asarray(x))
        assert float(emd[0]) < 1e-3

    def test_permutation_invariant(self):
        x = RNG.randn(1, 64, 3).astype(np.float32)
        perm = RNG.permutation(64)
        emd = compute_emd(jnp.asarray(x), jnp.asarray(x[:, perm]))
        assert float(emd[0]) < 1e-3

    def test_simple_translation(self):
        # all points shifted by d: optimal transport cost = d per point
        x = RNG.rand(1, 64, 3).astype(np.float32)
        y = x + np.array([0.5, 0, 0], np.float32)
        emd = compute_emd(jnp.asarray(x), jnp.asarray(y))
        # approximate matcher slightly overestimates; optimal is exactly 0.5
        assert 0.45 < float(emd[0]) < 0.65


class TestFPS:
    def test_greedy_property(self):
        x = RNG.randn(2, 100, 3).astype(np.float32)
        idx = np.asarray(furthest_point_sampling(jnp.asarray(x), 10))
        assert idx.shape == (2, 10)
        assert (idx[:, 0] == 0).all()
        for b in range(2):
            assert len(np.unique(idx[b])) == 10
            # verify greedy selection step by step
            chosen = [0]
            d = ((x[b] - x[b][0]) ** 2).sum(-1)
            for k in range(1, 10):
                nxt = int(d.argmax())
                assert idx[b, k] == nxt
                d = np.minimum(d, ((x[b] - x[b][nxt]) ** 2).sum(-1))

    def test_downsample(self):
        x = RNG.randn(2, 100, 3).astype(np.float32)
        out = downsample_point_clouds(jnp.asarray(x), 16)
        assert out.shape == (2, 16, 3)


class TestSWDPyramid:
    def test_pyramid_matches_torch(self):
        x = RNG.randn(2, 1, 32, 64).astype(np.float32)

        def t_kernel(weight):
            k = torch.tensor(weight).float()
            k = torch.outer(k, k)
            return (k / k.sum())[None, None]

        tx = torch.from_numpy(x)
        C = 1
        g = t_kernel([1, 4, 6, 4, 1]).repeat(C, 1, 1, 1)
        down_ref = F.conv2d(F.pad(tx, (2, 2, 2, 2), mode="reflect"), g, stride=2, groups=C)
        got = np.asarray(pyramid_down(jnp.asarray(x)))
        np.testing.assert_allclose(got, down_ref.numpy(), rtol=1e-4, atol=1e-5)

        small = down_ref
        dil = t_kernel([0, 1, 0]).repeat(C, 1, 1, 1)
        up = F.conv_transpose2d(small, dil, stride=2, padding=0, groups=C)
        up = F.pad(up[..., :-1, :-1], (2, 2, 2, 2), mode="reflect")
        up_ref = F.conv2d(up, g * 4, stride=1, padding=0, groups=C)
        got_up = np.asarray(pyramid_up(jnp.asarray(small.numpy())))
        np.testing.assert_allclose(got_up, up_ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_swd_zero_for_identical(self):
        img = RNG.randn(32, 1, 32, 64).astype(np.float32)
        res = compute_swd(img, img.copy(), num_levels=2, batch_size=16)
        assert res["swd-mean"] < 1e-5

    def test_swd_positive_for_different(self):
        a = RNG.randn(32, 1, 32, 64).astype(np.float32)
        b = RNG.randn(32, 1, 32, 64).astype(np.float32) * 3 + 1
        res = compute_swd(a, b, num_levels=2, batch_size=16)
        assert res["swd-mean"] > 0.1


class TestJSD:
    def test_zero_for_identical(self):
        pcs = (RNG.rand(8, 256, 3).astype(np.float32) - 0.5) * 0.5
        assert compute_jsd(pcs, pcs.copy()) < 1e-6

    def test_one_for_disjoint(self):
        a = np.full((4, 128, 3), 0.3, np.float32)
        b = np.full((4, 128, 3), -0.3, np.float32)
        jsd = compute_jsd(a, b)
        assert jsd > 0.9


class TestFPDKPD:
    def test_frechet_zero_same(self):
        f = RNG.randn(500, 32).astype(np.float64)
        assert abs(compute_frechet_distance(f, f.copy())) < 1e-6

    def test_frechet_mean_shift(self):
        f = RNG.randn(2000, 8)
        g = f + 2.0
        fd = compute_frechet_distance(g, f)
        assert abs(fd - 4.0 * 8) < 2.0  # |mu1-mu2|^2 = 4 per dim

    def test_kpd_near_zero_same_dist(self):
        np.random.seed(0)
        f = RNG.randn(800, 16)
        g = RNG.randn(800, 16)
        same = compute_squared_mmd(f, g, num_subsets=20)
        shifted = compute_squared_mmd(f, g + 1.0, num_subsets=20)
        assert shifted > same


class TestCovMmd1nna:
    def test_perfect_separation(self):
        # gen far from ref -> 1-NNA accuracy ~1, cov small
        ref = RNG.rand(12, 64, 3).astype(np.float32)
        gen = ref + 10.0
        res = compute_cov_mmd_1nna(gen, ref, batch_size=6, metrics=("cd",))
        assert res["1-nn-accuracy-cd"] == 1.0

    def test_identical_sets_confuse_classifier(self):
        ref = RNG.rand(12, 64, 3).astype(np.float32)
        gen = ref.copy() + RNG.randn(12, 64, 3).astype(np.float32) * 1e-4
        res = compute_cov_mmd_1nna(gen, ref, batch_size=6, metrics=("cd",))
        # every sample's nearest neighbor is its twin from the other set
        assert res["1-nn-accuracy-cd"] <= 0.1
        assert res["cov-cd"] == 1.0
        res_emd = compute_cov_mmd_1nna(gen, ref, batch_size=6, metrics=("emd",))
        assert res_emd["1-nn-accuracy-emd"] <= 0.1

    def test_pairwise_progress_callback_and_abort(self):
        """The progress hook (used by scripts/bench_emd_protocol.py for budgeted
        measured runs) reports monotone pair counts; raising from it aborts."""
        from dusty_gan_v2_tpu.metrics.cov_mmd_1nna import _pairwise_distance

        ref = RNG.rand(8, 32, 3).astype(np.float32)
        gen = RNG.rand(8, 32, 3).astype(np.float32)
        seen = []
        out = _pairwise_distance(
            ref, gen, 16, ("cd",),
            progress=lambda done, total, val: seen.append((done, total)),
        )["cd"]
        assert out.shape == (8, 8)
        assert seen[-1][0] == seen[-1][1] == 64
        assert [d for d, _ in seen] == sorted(d for d, _ in seen)

        class Boom(Exception):
            pass

        def aborting(done, total, val):
            raise Boom

        try:
            _pairwise_distance(ref, gen, 16, ("cd",), progress=aborting)
            assert False, "progress exception must propagate"
        except Boom:
            pass


class TestPointNet:
    def test_features_and_permutation_invariance(self):
        params = init_pointnet_params(jax.random.PRNGKey(0))
        x = jnp.asarray(RNG.randn(2, 3, 128).astype(np.float32))
        f = pointnet_features(params, x)
        assert f.shape == (2, 1024 + 512 + 256 + 16)
        perm = RNG.permutation(128)
        f2 = pointnet_features(params, x[:, :, perm])
        np.testing.assert_allclose(np.asarray(f), np.asarray(f2), rtol=1e-4, atol=1e-4)

    def test_matches_torch_oracle(self):
        """Build the reference torch PointNet, copy our params in, compare outputs."""
        import torch.nn as tnn

        class STN3d(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv1d(3, 64, 1)
                self.conv2 = tnn.Conv1d(64, 128, 1)
                self.conv3 = tnn.Conv1d(128, 1024, 1)
                self.fc1 = tnn.Linear(1024, 512)
                self.fc2 = tnn.Linear(512, 256)
                self.fc3 = tnn.Linear(256, 9)
                for i, c in zip(range(1, 6), (64, 128, 1024, 512, 256)):
                    setattr(self, f"bn{i}", tnn.BatchNorm1d(c))

            def forward(self, x):
                x = F.relu(self.bn1(self.conv1(x)))
                x = F.relu(self.bn2(self.conv2(x)))
                x = F.relu(self.bn3(self.conv3(x)))
                x = x.amax(dim=2)
                x = F.relu(self.bn4(self.fc1(x)))
                x = F.relu(self.bn5(self.fc2(x)))
                x = self.fc3(x).view(-1, 3, 3)
                return x + torch.eye(3)

        class Feat(tnn.Module):
            def __init__(self):
                super().__init__()
                self.stn = STN3d()
                self.conv1 = tnn.Conv1d(3, 64, 1)
                self.conv2 = tnn.Conv1d(64, 128, 1)
                self.conv3 = tnn.Conv1d(128, 1024, 1)
                self.bn1 = tnn.BatchNorm1d(64)
                self.bn2 = tnn.BatchNorm1d(128)
                self.bn3 = tnn.BatchNorm1d(1024)

            def forward(self, x):
                trans = self.stn(x)
                x = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
                x = F.relu(self.bn1(self.conv1(x)))
                x = F.relu(self.bn2(self.conv2(x)))
                x = self.bn3(self.conv3(x))
                return x.amax(dim=2)

        class Net(tnn.Module):
            def __init__(self, k=16):
                super().__init__()
                self.feat = Feat()
                self.fc1 = tnn.Linear(1024, 512)
                self.fc2 = tnn.Linear(512, 256)
                self.fc3 = tnn.Linear(256, k)
                self.bn1 = tnn.BatchNorm1d(512)
                self.bn2 = tnn.BatchNorm1d(256)

            def forward(self, x):
                x1 = self.feat(x)
                x2 = F.relu(self.bn1(self.fc1(x1)))
                x3 = F.relu(self.bn2(self.fc2(x2)))
                x4 = self.fc3(x3)
                return torch.cat((x1, x2, x3, x4), dim=1)

        net = Net().eval()
        # randomize running stats so BN eval math is actually exercised
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

        # convert torch -> params pytree using the same rules as load_torch_state_dict
        def to_tree(sd):
            out = {}
            for key, val in sd.items():
                if "num_batches_tracked" in key:
                    continue
                node = out
                parts = key.split(".")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                arr = val.detach().numpy()
                if parts[-1] == "weight" and arr.ndim == 3:
                    arr = arr[..., 0]
                node[parts[-1]] = jnp.asarray(arr)
            return out

        params = to_tree(net.state_dict())
        x = RNG.randn(2, 3, 64).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        got = np.asarray(pointnet_features(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


class TestFusedEMDEquivalence:
    def test_fused_cost_equals_match_cost(self):
        from dusty_gan_v2_tpu.metrics.distance import match_cost

        x = jnp.asarray(RNG.randn(2, 48, 3).astype(np.float32))
        y = jnp.asarray(RNG.randn(2, 48, 3).astype(np.float32))
        fused = earth_mover_distance(x, y)
        two_pass = match_cost(x, y, approx_match(x, y))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(two_pass), rtol=1e-5
        )


class TestPallasEMD:
    def test_matches_xla_in_interpret_mode(self):
        from dusty_gan_v2_tpu.metrics.pallas_emd import emd_pallas

        x = jnp.asarray(RNG.rand(2, 256, 3).astype(np.float32))
        y = jnp.asarray(RNG.rand(2, 256, 3).astype(np.float32))
        ref = earth_mover_distance(x, y)
        got = emd_pallas(x, y, tm=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4)


class TestPallasFPS:
    def test_matches_xla_exactly_in_interpret_mode(self):
        from dusty_gan_v2_tpu.metrics.fps import furthest_point_sampling
        from dusty_gan_v2_tpu.metrics.pallas_fps import fps_pallas

        xyz = jnp.asarray(RNG.randn(4, 256, 3).astype(np.float32))
        ref = np.asarray(furthest_point_sampling(xyz, 64))
        got = np.asarray(fps_pallas(xyz, 64, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_duplicate_points_ties(self):
        """Tie-breaking (lowest index) must match jnp.argmax semantics."""
        from dusty_gan_v2_tpu.metrics.fps import furthest_point_sampling
        from dusty_gan_v2_tpu.metrics.pallas_fps import fps_pallas

        base = RNG.randn(1, 128, 3).astype(np.float32)
        base[0, 64:] = base[0, :64]  # exact duplicates -> distance ties
        xyz = jnp.asarray(base)
        ref = np.asarray(furthest_point_sampling(xyz, 32))
        got = np.asarray(fps_pallas(xyz, 32, interpret=True))
        np.testing.assert_array_equal(got, ref)
