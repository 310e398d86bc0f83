"""ADA augmentation tests: upfirdn2d parity, warp correctness, adaptive-p control."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.augment.ada import SYM6, AdaptiveAugment, AdaState
from dusty_gan_v2_tpu.ops.resample import upfirdn2d

RNG = np.random.RandomState(0)


def torch_upfirdn2d_native(x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1):
    """Oracle: the documented upfirdn algorithm (reference upfirdn2d.py:167-208)."""
    _, channel, in_h, in_w = x.shape
    x = x.reshape(-1, in_h, in_w, 1)
    _, in_h, in_w, minor = x.shape
    kernel_h, kernel_w = kernel.shape
    out = x.view(-1, in_h, 1, in_w, 1, minor)
    out = F.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, minor)
    out = F.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
    out = out[
        :,
        max(-pad_y0, 0) : out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[2] - max(-pad_x1, 0),
        :,
    ]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up_y + pad_y0 + pad_y1, in_w * up_x + pad_x0 + pad_x1])
    w = torch.flip(kernel, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = F.conv2d(out, w)
    out = out.reshape(
        -1, minor,
        in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
        in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1,
    )
    out = out.permute(0, 2, 3, 1)
    out = out[:, ::down_y, ::down_x, :]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kernel_h) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kernel_w) // down_x + 1
    return out.view(-1, channel, out_h, out_w)


class TestUpfirdn2d:
    @pytest.mark.parametrize(
        "up,down,pad",
        [
            ((1, 2), (1, 1), (6, 5, 0, 0)),
            ((2, 1), (1, 1), (0, 0, 6, 5)),
            ((1, 1), (1, 2), (-1, -1, 0, 0)),
            ((1, 1), (2, 1), (0, 0, -1, -1)),
            ((2, 2), (1, 1), (2, 1, 2, 1)),
            ((1, 1), (2, 2), (1, 1, 1, 1)),
        ],
    )
    def test_matches_torch_native(self, up, down, pad):
        # NOTE: my upfirdn2d is cross-correlation (no flip) to match how the models use
        # separable symmetric kernels; the torch native oracle flips, so pass a flipped
        # kernel to it. Use an ASYMMETRIC kernel to make flips matter.
        x = RNG.randn(2, 3, 8, 16).astype(np.float32)
        k = np.asarray(SYM6, np.float32).reshape(1, -1)
        got = np.asarray(
            upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
        )
        ref = torch_upfirdn2d_native(
            torch.from_numpy(x),
            torch.from_numpy(np.flip(k, (0, 1)).copy()),
            up[1], up[0], down[1], down[0], *pad,
        ).numpy()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def ref_geometric(img, G):
    """Literal torch formulation of the reference ADA geometric path (oracle),
    including its data-dependent padding (adaptive_augment.py:471-535)."""
    k = torch.as_tensor(np.asarray(SYM6, np.float32))
    k_flip = torch.flip(k, (0,))
    B, C, H, W = img.shape
    G_inv = torch.inverse(G)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    cp = torch.tensor([(-cx, -cy, 1), (cx, -cy, 1), (cx, cy, 1), (-cx, cy, 1)])
    cp = G_inv @ cp.T
    pad_k = len(k) // 4
    pad = cp[:, :2, :].permute(1, 0, 2).flatten(1)
    pad = torch.cat((-pad, pad)).max(1).values
    pad = pad + torch.tensor([pad_k * 2 - cx, pad_k * 2 - cy] * 2)
    pad = pad.max(torch.tensor([0.0, 0.0] * 2)).min(torch.tensor([W - 1.0, H - 1.0] * 2))
    px1, py1, px2, py2 = [int(v) for v in pad.ceil().to(torch.int32)]
    img = F.pad(img, (px1, px2, 0, 0), mode="circular")
    img = F.pad(img, (0, 0, py1, py2), mode="reflect")
    t2d = lambda tx, ty: torch.tensor([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]])
    s2d = lambda sx, sy: torch.tensor([[sx, 0, 0], [0, sy, 0], [0, 0, 1.0]])
    G_inv = t2d((px1 - px2) / 2, (py1 - py2) / 2)[None] @ G_inv
    up_pad = ((len(k) + 2 - 1) // 2, (len(k) - 2) // 2)
    img = torch_upfirdn2d_native(img, k[None], 2, 1, 1, 1, up_pad[0], up_pad[1], 0, 0)
    img = torch_upfirdn2d_native(img, k[:, None], 1, 2, 1, 1, 0, 0, up_pad[0], up_pad[1])
    G_inv = s2d(2, 2)[None] @ G_inv @ s2d(0.5, 0.5)[None]
    G_inv = t2d(-0.5, -0.5)[None] @ G_inv @ t2d(0.5, 0.5)[None]
    shape = (B, C, (H + pad_k * 2) * 2, (W + pad_k * 2) * 2)
    G_inv = (
        s2d(2 / img.shape[3], 2 / img.shape[2])[None]
        @ G_inv
        @ s2d(1 / (2 / shape[3]), 1 / (2 / shape[2]))[None]
    )
    grid = F.affine_grid(G_inv[:, :2, :], shape, align_corners=False)
    img = F.grid_sample(
        img, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    d_p = -pad_k * 2
    dn = (d_p + (len(k) - 2 + 1) // 2, d_p + (len(k) - 2) // 2)
    img = torch_upfirdn2d_native(img, k_flip[None], 1, 1, 2, 1, dn[0], dn[1], 0, 0)
    img = torch_upfirdn2d_native(img, k_flip[:, None], 1, 1, 1, 2, 0, 0, dn[0], dn[1])
    return img


def make_ada(**overrides):
    policy = dict(
        lr_flip=1, ud_flip=1, int_trans=1, iso_scale=1, frac_trans=1,
        brightness=1, contrast=1, luma_flip=1, hue=1, saturation=1,
        imgfilter=0, noise=0, cutout=0,
    )
    policy.update(overrides)
    return AdaptiveAugment(p_init=0.0, p_target=0.6, kimg=500, **policy)


class TestAdaWarp:
    def test_identity_at_p_zero(self):
        ada = make_ada()
        x = jnp.asarray(RNG.randn(2, 1, 16, 64).astype(np.float32))
        y = ada(x, jnp.zeros(()), jax.random.PRNGKey(0))
        assert y.shape == x.shape
        # p=0 -> all transforms identity; up/down wavelet chain is near-exact
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)

    @pytest.mark.parametrize(
        "name,Gm",
        [
            ("identity", np.eye(3)),
            ("lr_flip", np.diag([-1.0, 1.0, 1.0])),
            ("ud_flip", np.diag([1.0, -1.0, 1.0])),
            ("int_trans", np.array([[1, 0, 16.0], [0, 1, 0], [0, 0, 1]])),
            ("v_trans", np.array([[1, 0, 0], [0, 1, 4.0], [0, 0, 1]])),
            ("scale", np.array([[1, 0, 0], [0, 1.3, 0], [0, 0, 1]])),
            ("combo", np.array([[-1, 0, 7.3], [0, 1.21, -2.1], [0, 0, 1]])),
        ],
    )
    def test_geometric_matches_reference_oracle(self, name, Gm):
        """Full parity vs a literal torch formulation of the reference ADA geometric
        path (dynamic padding + upfirdn + affine_grid + grid_sample)."""
        ada = make_ada()
        x = RNG.randn(1, 1, 16, 64).astype(np.float32)
        ref = ref_geometric(
            torch.from_numpy(x), torch.from_numpy(Gm.astype(np.float32))[None]
        ).numpy()
        got = np.asarray(
            ada._geometric(jnp.asarray(x), jnp.asarray(Gm.astype(np.float32))[None])
        )
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_color_transform_single_channel(self):
        # brightness-only policy, p=1: img' = img*mean-row-sum + mean-row-translate
        ada = make_ada(
            lr_flip=0, ud_flip=0, int_trans=0, iso_scale=0, frac_trans=0,
            contrast=0, luma_flip=0, hue=0, saturation=0, brightness=1,
        )
        x = jnp.asarray(RNG.randn(4, 1, 16, 64).astype(np.float32))
        y = ada(x, jnp.ones(()), jax.random.PRNGKey(1))
        assert y.shape == x.shape
        # brightness shifts: per-sample constant offset (geometric is identity)
        d = np.asarray(y - x)
        per_sample_std = d.reshape(4, -1).std(axis=1)
        assert (per_sample_std < 2e-3).all()

    def test_grad_flows_through_augment(self):
        ada = make_ada()
        x = jnp.asarray(RNG.randn(2, 1, 16, 64).astype(np.float32))

        def f(x):
            return jnp.sum(ada(x, jnp.asarray(0.5), jax.random.PRNGKey(0)) ** 2)

        g = jax.grad(f)(x)
        assert np.isfinite(np.asarray(g)).all()
        # double backward (R1 through augmented reals)
        gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
        assert np.isfinite(np.asarray(gg)).all()


class TestAdaControl:
    def test_p_increases_when_d_confident(self):
        ada = make_ada()
        state = ada.init_state()
        y_real = jnp.ones((32,)) * 3.0  # D very confident -> rt=1 > 0.6
        for _ in range(4):
            state = ada.cumulate(state, y_real)
        state, rt = ada.update_p(state)
        assert float(rt) == 1.0
        assert float(state.p) == pytest.approx(4 * 32 / 500e3)
        assert float(state.sign_cum) == 0.0 and float(state.n_pred_cum) == 0.0

    def test_p_decreases_toward_zero(self):
        ada = make_ada()
        state = AdaState(
            p=jnp.asarray(0.5), sign_cum=jnp.asarray(-64.0), n_pred_cum=jnp.asarray(128.0)
        )
        state, rt = ada.update_p(state)
        assert float(rt) == -0.5
        assert float(state.p) == pytest.approx(0.5 - 128 / 500e3)

    def test_p_clamped(self):
        ada = make_ada()
        state = AdaState(
            p=jnp.asarray(0.899999), sign_cum=jnp.asarray(1e9), n_pred_cum=jnp.asarray(1e9)
        )
        state, _ = ada.update_p(state)
        assert float(state.p) <= 0.9


class TestDiffAugment:
    def test_identity_at_p_zero(self):
        from dusty_gan_v2_tpu.augment.diff_augment import DiffAugment

        da = DiffAugment()
        x = jnp.asarray(RNG.randn(2, 1, 8, 32).astype(np.float32))
        y = da(x, jnp.zeros(()), jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_translation_matches_torch(self):
        """Oracle: the reference rand_translation gather semantics with fixed shifts."""
        from dusty_gan_v2_tpu.augment.diff_augment import rand_translation

        B, C, H, W = 2, 3, 8, 16
        x = RNG.randn(B, C, H, W).astype(np.float32)

        # torch oracle with forced shifts
        th = np.array([[2], [-1]])[:, :, None]
        tw = np.array([[3], [-4]])[:, :, None]
        tx = torch.from_numpy(x)
        gb, gh, gw = torch.meshgrid(
            torch.arange(B), torch.arange(H), torch.arange(W), indexing="ij"
        )
        x_pad = F.pad(tx, [0, 0, 1, 1, 0, 0, 0, 0])
        gh2 = torch.clamp(gh + torch.from_numpy(th) + 1, min=0, max=H + 1)
        gw2 = (gw + torch.from_numpy(tw)) % (W - 1)
        ref = (
            x_pad.permute(0, 2, 3, 1)[gb, gh2, gw2].permute(0, 3, 1, 2).numpy()
        )

        # monkeypatch jax randint to return the same shifts
        import dusty_gan_v2_tpu.augment.diff_augment as da_mod

        orig = jax.random.randint
        calls = {"n": 0}

        def fake_randint(key, shape, minval, maxval):
            calls["n"] += 1
            return jnp.asarray(th if calls["n"] == 1 else tw, jnp.int32)

        jax.random.randint = fake_randint
        try:
            got = rand_translation(jnp.asarray(x), jax.random.PRNGKey(0), jnp.ones(()))
        finally:
            jax.random.randint = orig
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)

    def test_controller(self):
        from dusty_gan_v2_tpu.augment.diff_augment import DiffAugment

        da = DiffAugment()
        s = da.init_state()
        s = da.cumulate(s, jnp.ones((16,)))
        s, rt = da.update_p(s)
        assert float(rt) == 1.0 and float(s.p) > 0


class TestImgfilterNoiseCutout:
    """Oracle tests for the ADA pipeline tail (reference adaptive_augment.py:547-621)."""

    def test_apply_imgfilter_matches_torch(self):
        """Filter application (given per-sample Hz') vs the reference grouped-conv
        formulation (:585-595) run literally in torch."""
        from dusty_gan_v2_tpu.augment.ada import apply_imgfilter

        B, C, H, W = 3, 2, 32, 64  # H must exceed taps//2=21 (reflect pad)
        ada = make_ada(imgfilter=1)
        taps = int(np.asarray(ada.Hz_fbank).shape[1])
        img = RNG.randn(B, C, H, W).astype(np.float32)
        Hz_prime = RNG.randn(B, taps).astype(np.float32)

        got = np.asarray(apply_imgfilter(jnp.asarray(img), jnp.asarray(Hz_prime)))

        # literal torch port of reference :585-595
        t = torch.from_numpy(img)
        Hp = torch.from_numpy(Hz_prime).unsqueeze(1).repeat(1, C, 1).reshape(B * C, 1, -1)
        p = taps // 2
        t = t.reshape(1, B * C, H, W)
        t = F.pad(t, (p, p, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, p, p), mode="reflect")
        t = F.conv2d(t, Hp.unsqueeze(2), groups=B * C)
        t = F.conv2d(t, Hp.unsqueeze(3), groups=B * C)
        ref = t.reshape(B, C, H, W).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_imgfilter_gains_identity_at_p_zero(self):
        """p=0: every band gain stays 1, so Hz' = sum of bank rows = ~delta filter;
        the full imgfilter is then a near-identity (same property as the reference)."""
        from dusty_gan_v2_tpu.parallel.persample import PerSampleStream, global_ids

        ada = make_ada(imgfilter=1)
        st = PerSampleStream(jax.random.PRNGKey(0), global_ids(4))
        gains = np.asarray(ada.imgfilter_gains(jnp.zeros(()), st))
        bank_sum = np.asarray(ada.Hz_fbank).sum(0)
        np.testing.assert_allclose(gains, np.tile(bank_sum, (4, 1)), rtol=1e-5, atol=1e-6)

        img = jnp.asarray(RNG.randn(2, 1, 32, 64).astype(np.float32))
        out = np.asarray(ada(img, jnp.zeros(()), jax.random.PRNGKey(1)))
        np.testing.assert_allclose(out, np.asarray(img), rtol=1e-3, atol=1e-4)

    def test_imgfilter_gains_formula(self):
        """Gain accumulation (:556-576): numpy replica of the reference formula driven
        by the same PRNG draws as our implementation."""
        from dusty_gan_v2_tpu.parallel.persample import PerSampleStream, global_ids

        ada = make_ada(imgfilter=1)
        B, p = 16, 0.7
        rng = jax.random.PRNGKey(3)
        gains = np.asarray(ada.imgfilter_gains(jnp.asarray(p), PerSampleStream(rng, global_ids(B))))

        ep = np.array([10, 1, 1, 1]) / 13
        g = np.ones((B, 4))
        st = PerSampleStream(rng, global_ids(B))
        for i, band_strength in enumerate(ada.imgfilter_bands):
            t_i = np.exp2(np.asarray(st.normal()) * ada.imgfilter_std)
            on = np.asarray(st.uniform()) < ada.mul["imgfilter"] * p * band_strength
            t_i = np.where(on, t_i, 1.0)
            t = np.ones((B, 4))
            t[:, i] = t_i
            t = t / np.sqrt((ep * t**2).sum(-1, keepdims=True))
            g = g * t
        ref = g @ np.asarray(ada.Hz_fbank)
        np.testing.assert_allclose(gains, ref, rtol=1e-5, atol=1e-6)

    def test_cutout_mask_matches_torch(self):
        from dusty_gan_v2_tpu.augment.ada import cutout_mask

        B, H, W = 4, 16, 32
        center = RNG.rand(B, 2, 1, 1, 1).astype(np.float32)
        size = np.full((B, 2, 1, 1, 1), 0.5, np.float32)
        size[0] = 0.0  # gated-off sample
        got = np.asarray(cutout_mask(jnp.asarray(center), jnp.asarray(size), H, W))

        # literal torch port of reference :609-620
        c = torch.from_numpy(center)
        s = torch.from_numpy(size)
        coord_x = torch.arange(W).reshape(1, 1, 1, -1)
        coord_y = torch.arange(H).reshape(1, 1, -1, 1)
        mask_x = ((coord_x + 0.5) / W - c[:, 0]).abs() >= s[:, 0] / 2
        mask_y = ((coord_y + 0.5) / H - c[:, 1]).abs() >= s[:, 1] / 2
        ref = torch.logical_or(mask_x, mask_y).float().numpy()
        np.testing.assert_array_equal(got.astype(np.float32), ref)
        assert got[0].all()  # size 0 -> nothing cut
        assert not got[1].all()  # size 0.5 -> some pixels cut

    def test_noise_statistics(self):
        """sigma ~ |N(0,1)|*0.1 gated at mul*p: added variance ~= E[sigma^2] = 0.01
        (reference :598-606). Statistical check at p=1."""
        ada = make_ada(noise=1)
        B, C, H, W = 64, 1, 32, 64
        img = jnp.zeros((B, C, H, W))
        out = np.asarray(ada(img, jnp.ones(()), jax.random.PRNGKey(5)))
        per_sample_var = out.reshape(B, -1).var(axis=1)
        assert per_sample_var.max() > 0  # noise actually applied
        # E[var] = E[sigma^2] = 0.01 * E[|N|^2] = 0.01
        assert abs(per_sample_var.mean() - 0.01) < 0.004, per_sample_var.mean()

        # p=0 -> all gated off
        out0 = np.asarray(ada(img, jnp.zeros(()), jax.random.PRNGKey(6)))
        np.testing.assert_allclose(out0, 0.0, atol=1e-7)

    def test_cutout_grad_and_gating(self):
        ada = make_ada(cutout=1)
        img = jnp.asarray(RNG.randn(4, 1, 16, 32).astype(np.float32))
        out = np.asarray(ada(img, jnp.ones(()), jax.random.PRNGKey(7)))
        # at p=1 cutout always fires: each sample loses ~25% of pixels
        frac_zero = (out == 0).reshape(4, -1).mean(1)
        assert (frac_zero > 0.1).all() and (frac_zero < 0.5).all(), frac_zero

        g = jax.grad(lambda x: jnp.sum(ada(x, jnp.ones(()), jax.random.PRNGKey(7)) ** 2))(img)
        assert np.isfinite(np.asarray(g)).all()
