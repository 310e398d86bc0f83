"""Geometry layer tests: angle LUT resampling, coordinate conversions, normals, render."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dusty_gan_v2_tpu.geometry import (
    CoordBridge,
    bilinear_rasterizer,
    bilinear_resize,
    estimate_surface_normal,
    make_Rt,
    render_point_clouds,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "coords", "kitti_raw.npy")
RNG = np.random.RandomState(0)


class TestBilinearResize:
    @pytest.mark.parametrize("size", [(8, 24), (64, 512), (13, 57)])
    def test_matches_torch_interpolate(self, size):
        x = RNG.randn(2, 4, 16, 48).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), size))
        ref = F.interpolate(
            torch.from_numpy(x), size=size, mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def coord():
    return CoordBridge(
        num_ring=64, num_points=512, min_depth=1.45, max_depth=80.0, angle_file=DATA
    )


class TestCoordBridge:
    def test_angle_resampling_matches_torch(self, coord):
        # oracle: the documented sin/cos + tile + F.interpolate + atan2 pipeline
        raw = np.load(DATA)
        angle = torch.from_numpy(raw).permute(2, 0, 1)[None]
        periodic = torch.cat([angle.sin(), angle.cos()], dim=1)
        periodic = torch.cat([periodic] * 3, dim=3)
        periodic = F.interpolate(
            periodic, size=(64, 512 * 3), mode="bilinear", align_corners=False
        )
        periodic = periodic[..., 512 : 2 * 512]
        ref = torch.atan2(periodic[:, :2], periodic[:, 2:]).numpy()
        np.testing.assert_allclose(np.asarray(coord.angle), ref, rtol=1e-4, atol=1e-5)

    def test_depth_invdepth_roundtrip(self, coord):
        depth = jnp.asarray(RNG.uniform(2.0, 79.0, (2, 1, 64, 512)).astype(np.float32))
        inv_n = coord.convert(depth, "depth", "inv_depth_norm")
        assert float(jnp.max(inv_n)) <= 1.0 and float(jnp.min(inv_n)) > 0.0
        back = coord.convert(inv_n, "inv_depth_norm", "depth")
        np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-4)

    def test_invalid_depths_masked(self, coord):
        depth = jnp.asarray(np.array([[0.0, 1.0, 100.0, 40.0]], np.float32)).reshape(
            1, 1, 1, 4
        )
        inv_n = coord.convert(depth, "depth", "inv_depth_norm")
        v = np.asarray(inv_n).ravel()
        assert v[0] == 0.0 and v[1] == 0.0 and v[2] == 0.0 and v[3] > 0.0

    def test_point_map_norm_is_depth(self, coord):
        depth = jnp.asarray(RNG.uniform(2.0, 79.0, (1, 1, 64, 512)).astype(np.float32))
        pm = coord.convert(depth, "depth", "point_map")
        assert pm.shape == (1, 3, 64, 512)
        d2 = coord.convert(pm, "point_map", "depth")
        np.testing.assert_allclose(np.asarray(d2), np.asarray(depth), rtol=1e-4)

    def test_point_set_shape(self, coord):
        depth = jnp.asarray(RNG.uniform(2.0, 79.0, (2, 1, 64, 512)).astype(np.float32))
        ps = coord.convert(depth, "depth", "point_set")
        assert ps.shape == (2, 64 * 512, 3)

    def test_normal_map(self, coord):
        depth = jnp.asarray(
            np.full((1, 1, 64, 512), 10.0, np.float32)
            + RNG.rand(1, 1, 64, 512).astype(np.float32)
        )
        nm = coord.convert(depth, "depth", "normal_map")
        assert nm.shape == (1, 3, 64, 512)
        norms = np.linalg.norm(np.asarray(nm), axis=1)
        # unit or (near-)zero; the +1e-8 denominator slightly shrinks tiny normals
        assert (norms <= 1.0 + 1e-4).all()
        assert (norms > 0.9).mean() > 0.5

    def test_bev_render(self, coord):
        depth = jnp.asarray(RNG.uniform(2.0, 79.0, (1, 1, 64, 512)).astype(np.float32))
        inv_n = coord.convert(depth, "depth", "inv_depth_norm")
        Rt = make_Rt(pitch=np.pi / 4, z=0.8)
        bev = coord.make_birds_eye_view(inv_n, Rt)
        assert bev.shape == (1, 3, 512, 512)
        assert np.isfinite(np.asarray(bev)).all()


class TestNormalsOracle:
    def test_matches_torch_formulation(self):
        """Oracle: independent torch version of the closest-pair cross-product spec."""
        B, H, W, d = 2, 8, 16, 2
        pts = RNG.randn(B, 3, H, W).astype(np.float32)

        got = np.asarray(estimate_surface_normal(jnp.asarray(pts), d=d))

        t = torch.from_numpy(pts)
        t = F.pad(t, (0, 0, d, d), mode="replicate")
        t = F.pad(t, (d, d, 0, 0), mode="circular")
        t = t.permute(0, 2, 3, 1)
        offsets = [(-d, 0), (-d, d), (0, d), (d, d), (d, 0), (d, -d), (0, -d), (-d, -d)]
        anchors = t[:, d : d + H, d : d + W]  # (B,H,W,3)
        n1 = torch.stack(
            [t[:, d + dh : d + dh + H, d + dw : d + dw + W] for dh, dw in offsets], 1
        )
        n2 = torch.stack(
            [
                t[
                    :,
                    d + offsets[(k + 2) % 8][0] : d + offsets[(k + 2) % 8][0] + H,
                    d + offsets[(k + 2) % 8][1] : d + offsets[(k + 2) % 8][1] + W,
                ]
                for k in range(8)
            ],
            1,
        )
        diff = (n1 - anchors[:, None]).norm(dim=4) + (n2 - anchors[:, None]).norm(dim=4)
        i = diff.argmin(dim=1)  # (B,H,W)
        idx = i[:, None, :, :, None].expand(-1, 1, -1, -1, 3)
        p1 = n1.gather(1, idx)[:, 0]
        p2 = n2.gather(1, idx)[:, 0]
        normals = torch.cross(p1 - anchors, p2 - anchors, dim=-1)
        normals = normals / (normals.norm(dim=3, keepdim=True) + 1e-8)
        ref = normals.permute(0, 3, 1, 2).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestRasterizer:
    def test_matches_torch_scatter(self):
        B, N, C, H, W = 2, 100, 3, 16, 16
        coords = RNG.uniform(-1, H + 1, (B, N, 2)).astype(np.float32)
        values = RNG.randn(B, N, C).astype(np.float32)
        got = np.asarray(
            bilinear_rasterizer(jnp.asarray(coords), jnp.asarray(values), (H, W))
        )
        # torch oracle per the documented splatting algorithm
        tc = torch.from_numpy(coords)
        tv = torch.from_numpy(values)
        h = tc[..., [0]].expand(-1, -1, C)
        w = tc[..., [1]].expand(-1, -1, C)
        h_t, w_l = torch.floor(h), torch.floor(w)
        h_b, w_r = h_t + 1, w_l + 1
        h_t_s, h_b_s = h_t.clamp(0, H - 1), h_b.clamp(0, H - 1)
        w_l_s, w_r_s = w_l.clamp(0, W - 1), w_r.clamp(0, W - 1)
        wht = (h_b - h) * (h_t == h_t_s).float()
        whb = (h - h_t) * (h_b == h_b_s).float()
        wwl = (w_r - w) * (w_l == w_l_s).float()
        wwr = (w - w_l) * (w_r == w_r_s).float()
        render = torch.zeros(B, H * W, C)
        for wt, hh, ww in [
            (wht * wwl, h_t_s, w_l_s),
            (wht * wwr, h_t_s, w_r_s),
            (whb * wwl, h_b_s, w_l_s),
            (whb * wwr, h_b_s, w_r_s),
        ]:
            wt = wt * (wt >= 1e-3).float()
            render.scatter_add_(1, (ww + W * hh).long(), tv * wt)
        ref = render.reshape(B, H, W, C).permute(0, 3, 1, 2).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
