"""Op-level parity tests.

Oracle strategy (SURVEY.md §4): the reference verifies CUDA kernels against CPU/torch
paths; we mirror that by checking our JAX ops against independent torch-CPU
formulations of the same documented math (F.pad/F.conv2d compositions written from the
op specs, not copied code).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu import ops


def t2n(t):
    return t.detach().cpu().numpy()


RNG = np.random.RandomState(0)


def rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


class TestPad:
    @pytest.mark.parametrize("ring", [True, False])
    @pytest.mark.parametrize("mode", ["replicate", "reflect"])
    def test_pad2d_matches_torch(self, ring, mode):
        x = rand(2, 3, 8, 16)
        pad = (2, 1, 3, 2)  # l, r, t, b
        got = np.asarray(ops.pad2d(jnp.asarray(x), pad, ring=ring, mode=mode))
        tx = torch.from_numpy(x)
        hmode = "circular" if ring else mode
        ref = F.pad(tx, (pad[0], pad[1], 0, 0), mode=hmode)
        ref = F.pad(ref, (0, 0, pad[2], pad[3]), mode=mode)
        np.testing.assert_allclose(got, t2n(ref), rtol=0, atol=0)

    @pytest.mark.parametrize("k,stride,mode", [
        (3, 1, "replicate"), (3, 2, "replicate"), (3, 1, "reflect"),
        (4, 2, "replicate"), (4, 2, "reflect"),
    ])
    @pytest.mark.parametrize("shape", [(8, 16), (6, 10), (4, 32)])
    def test_conv_ring_fast_exact(self, k, stride, mode, shape):
        """Pad-free ring conv == conv over the materialized circular/replicate/
        reflect pad, forward and both grads (it replaces the padded copy in
        dusty_v2's D 3x3s and vanilla's 4x4 downsamples)."""
        from jax import lax

        from dusty_gan_v2_tpu.ops.pad import conv_ring_fast, pad2d

        H, W = shape
        x = jnp.asarray(rand(2, 3, H, W))
        w = jnp.asarray(rand(5, 3, k, k))
        s = (stride, stride)

        def ref_fn(x, w):
            return lax.conv_general_dilated(
                pad2d(x, 1, ring=True, mode=mode), w, s, "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        ref = ref_fn(x, w)
        got = conv_ring_fast(x, w, s, h_mode=mode)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=0)

        loss_ref = lambda x, w: jnp.sum(jnp.sin(ref_fn(x, w)))
        loss_got = lambda x, w: jnp.sum(jnp.sin(conv_ring_fast(x, w, s, h_mode=mode)))
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gg = jax.grad(loss_got, argnums=(0, 1))(x, w)
        # grads reduce over many terms -> pure fp-reassociation noise scales with
        # the magnitude; relative tolerance is the right yardstick
        np.testing.assert_allclose(
            np.asarray(gg[0]), np.asarray(gr[0]), atol=5e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gg[1]), np.asarray(gr[1]), atol=5e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("mode", ["replicate", "reflect"])
    @pytest.mark.parametrize("shape", [(8, 16), (6, 10), (4, 32)])
    def test_convT_ring_fast_exact(self, mode, shape):
        """Pad-free ConvT(pad2d(x,1), k=4, s=2, p=3) == the materialized-pad
        composite (it replaces the padded copies in vanilla G's upsamples)."""
        from jax import lax

        from dusty_gan_v2_tpu.ops.pad import convT4x4s2_ring_fast, pad2d

        H, W = shape
        x = jnp.asarray(rand(2, 3, H, W))
        w_t = jnp.asarray(rand(5, 3, 4, 4))

        def ref_fn(x, w_t):
            return lax.conv_general_dilated(
                pad2d(x, 1, ring=True, mode=mode), w_t, (1, 1), ((0, 0), (0, 0)),
                lhs_dilation=(2, 2), dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        ref = ref_fn(x, w_t)
        got = convT4x4s2_ring_fast(x, w_t, h_mode=mode)
        assert got.shape == ref.shape == (2, 5, 2 * H, 2 * W)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=0)
        gr = jax.grad(lambda x, w: jnp.sum(jnp.sin(ref_fn(x, w))), (0, 1))(x, w_t)
        gg = jax.grad(
            lambda x, w: jnp.sum(jnp.sin(convT4x4s2_ring_fast(x, w, h_mode=mode))),
            (0, 1),
        )(x, w_t)
        np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gr[0]), atol=5e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gr[1]), atol=5e-5, rtol=1e-5)

    def test_filter2d_matches_torch(self):
        x = rand(2, 4, 8, 16)
        kernel = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
        got = np.asarray(ops.filter2d(jnp.asarray(x), jnp.asarray(kernel)))
        # torch oracle per the documented algorithm
        tk = torch.from_numpy(kernel)
        tk = tk / tk.sum()
        f = len(kernel)
        tx = torch.from_numpy(x)
        tx = F.pad(tx, (f // 2, (f - 1) // 2, 0, 0), mode="circular")
        tx = F.pad(tx, (0, 0, f // 2, (f - 1) // 2), mode="replicate")
        C = x.shape[1]
        k2 = tk[None, None].repeat(C, 1, 1)
        tx = F.conv2d(tx, k2[..., None, :], groups=C)
        tx = F.conv2d(tx, k2[..., :, None], groups=C)
        np.testing.assert_allclose(got, t2n(tx), rtol=1e-5, atol=1e-5)


def torch_resample(x, up=1, down=1, window=(1, 3, 3, 1), ring=True, direction="hw"):
    """Literal torch formulation of the reference Resample algorithm (oracle)."""
    up = (up, up) if isinstance(up, int) else up
    down = (down, down) if isinstance(down, int) else down
    n_taps = len(window)
    k_h = n_taps if "h" in direction else 1
    k_w = n_taps if "w" in direction else 1
    up_h = up[0] if "h" in direction else 1
    up_w = up[1] if "w" in direction else 1
    down_h = down[0] if "h" in direction else 1
    down_w = down[1] if "w" in direction else 1
    kernel = torch.tensor(window, dtype=torch.float32)
    kernel = kernel / kernel.sum()
    kernel = kernel * (up_h * up_w) ** 0.5
    if up[0] > 1:
        ph0 = (k_h - up_h + 1) // 2 + up_h - 1
        ph1 = (k_h - up_h) // 2
    else:
        ph0 = (k_h - down_h + 1) // 2
        ph1 = (k_h - down_h) // 2
    if up[1] > 1:
        pw0 = (k_w - up_w + 1) // 2 + up_w - 1
        pw1 = (k_w - up_w) // 2
    else:
        pw0 = (k_w - down_w + 1) // 2
        pw1 = (k_w - down_w) // 2
    margin = max(ph0, ph1, pw0, pw1)
    h = F.pad(x, (margin, margin, 0, 0), mode="circular" if ring else "replicate")
    h = F.pad(h, (0, 0, margin, margin), mode="replicate")
    B, C, H, W = h.shape
    h = h.view(B, C, H, 1, W, 1)
    h = F.pad(h, [0, up_w - 1, 0, 0, 0, up_h - 1])
    h = h.view(B, C, H * up_h, W * up_w)
    h = h[
        ...,
        margin * up_h - ph0 : (H - margin) * up_h + ph1,
        margin * up_w - pw0 : (W - margin) * up_w + pw1,
    ]
    k2 = kernel[None, None].repeat(C, 1, 1)
    if direction == "hw":
        h = F.conv2d(h, k2[..., None, :], groups=C)
        h = F.conv2d(h, k2[..., :, None], groups=C)
    elif direction == "h":
        h = F.conv2d(h, k2[..., :, None], groups=C)
    else:
        h = F.conv2d(h, k2[..., None, :], groups=C)
    return h[:, :, ::down_h, ::down_w]


class TestResample:
    @pytest.mark.parametrize(
        "up,down,direction",
        [
            (2, 1, "hw"),
            (1, 2, "hw"),
            (1, 1, "hw"),
            (1, 1, "h"),
            (1, 1, "w"),
            (1, 2, "w"),
            (2, 1, "w"),
            (4, 1, "hw"),
            (1, 4, "hw"),
        ],
    )
    @pytest.mark.parametrize("ring", [True, False])
    def test_matches_reference_algorithm(self, up, down, direction, ring):
        x = rand(2, 3, 8, 16)
        plan = ops.make_resample(up=up, down=down, ring=ring, direction=direction)
        got = np.asarray(ops.resample(jnp.asarray(x), plan))
        ref = t2n(
            torch_resample(
                torch.from_numpy(x), up=up, down=down, ring=ring, direction=direction
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_out_shape(self):
        plan = ops.make_resample(up=2)
        assert plan.out_shape(8, 16) == (16, 32)
        plan = ops.make_resample(down=2)
        assert plan.out_shape(8, 16) == (4, 8)
        x = rand(1, 1, 8, 16)
        assert ops.resample(jnp.asarray(x), ops.make_resample(window=(1, 2, 1))).shape == (
            1,
            1,
            8,
            16,
        )

    def test_blur_vh(self):
        x = rand(2, 3, 8, 16)
        got = np.asarray(ops.blur_vh(jnp.asarray(x)))
        tv = torch_resample(torch.from_numpy(x), window=(1, 2, 1), direction="h")
        th = torch_resample(torch.from_numpy(x), window=(1, 2, 1), direction="w")
        ref = np.concatenate([t2n(tv), t2n(th)], axis=1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestFusedLeakyReLU:
    def test_matches_formula(self):
        x = rand(2, 5, 4, 4)
        b = rand(5)
        got = np.asarray(ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
        ref = t2n(
            F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b).view(1, 5, 1, 1), 0.2)
            * np.sqrt(2.0)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_pallas_interpret_matches_xla(self):
        # On CPU the pallas kernel runs in interpret mode via force flag
        from jax.experimental.pallas import tpu as pltpu

        x = jnp.asarray(rand(2, 5, 4, 4))
        b = jnp.asarray(rand(5))
        ref = ops.fused_leaky_relu(x, b)
        with pltpu.force_tpu_interpret_mode():
            got = ops.fused_leaky_relu_pallas(x, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    def test_pallas_grad(self):
        from jax.experimental.pallas import tpu as pltpu

        x = jnp.asarray(rand(2, 3, 4, 4))
        b = jnp.asarray(rand(3))
        f_ref = lambda x, b: jnp.sum(ops.fused_leaky_relu(x, b) ** 2)
        gx_ref, gb_ref = jax.grad(f_ref, argnums=(0, 1))(x, b)
        with pltpu.force_tpu_interpret_mode():
            f = lambda x, b: jnp.sum(ops.fused_leaky_relu_pallas(x, b) ** 2)
            gx, gb = jax.grad(f, argnums=(0, 1))(x, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), rtol=1e-5, atol=1e-5)

    def test_double_backward(self):
        # R1/PL need grad-of-grad through the activation
        x = jnp.asarray(rand(2, 3, 4, 4))
        b = jnp.asarray(rand(3))
        f = lambda x: jnp.sum(ops.fused_leaky_relu(x, b) ** 2)
        g = lambda x: jnp.sum(jax.grad(f)(x) ** 2)
        gg = jax.grad(g)(x)
        assert np.isfinite(np.asarray(gg)).all()


class TestNormalize:
    def test_pixel_norm(self):
        x = rand(4, 8)
        got = np.asarray(ops.pixel_norm(jnp.asarray(x), axis=1))
        tx = torch.from_numpy(x)
        ref = t2n(tx / tx.pow(2).mean(dim=1, keepdim=True).add(1e-8).sqrt())
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_minibatch_stddev(self):
        x = rand(8, 6, 4, 4)
        got = np.asarray(ops.minibatch_stddev(jnp.asarray(x), group=4, features=1))
        # torch oracle per the documented algorithm
        tx = torch.from_numpy(x)
        B, C, H, W = tx.shape
        g = 4
        y = tx.view(g, -1, 1, C // 1, H, W)
        y = torch.sqrt(y.var(0, unbiased=False) + 1e-8)
        y = y.mean([2, 3, 4], keepdim=True).squeeze(2)
        y = y.repeat(g, 1, H, W)
        ref = t2n(torch.cat([tx, y], dim=1))
        assert got.shape == (8, 7, 4, 4)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestEqualLR:
    def test_dense_matches_torch(self):
        in_f, out_f, gain, lr_mul = 16, 8, np.sqrt(2.0), 0.01
        layer = ops.EqualLRDense(in_features=in_f, features=out_f, gain=gain, lr_mul=lr_mul)
        x = rand(4, in_f)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(params["params"]["weight"])
        b = np.asarray(params["params"]["bias"])
        got = np.asarray(layer.apply(params, jnp.asarray(x)))
        # torch-style oracle: y = ((x*scale) @ W.T + b) * gain * lr_mul
        scale = 1.0 / np.sqrt(in_f)
        ref = ((x * scale) @ w.T + b) * gain * lr_mul
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        # init distribution ~ N(0, 1/lr_mul)
        assert abs(w.std() - 1.0 / lr_mul) / (1.0 / lr_mul) < 0.2

    def test_conv_matches_torch(self):
        layer = ops.EqualLRConv2d(in_ch=3, out_ch=5, kernel_size=(3, 3), stride=(2, 2))
        x = rand(2, 3, 9, 9)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = torch.from_numpy(np.asarray(params["params"]["weight"]))
        b = torch.from_numpy(np.asarray(params["params"]["bias"]))
        got = np.asarray(layer.apply(params, jnp.asarray(x)))
        scale = 1.0 / np.sqrt(3 * 3 * 3)
        ref = t2n(F.conv2d(torch.from_numpy(x) * scale, w, b, stride=2))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_conv_transpose_matches_torch(self):
        layer = ops.EqualLRConvTranspose2d(
            in_ch=3, out_ch=5, kernel_size=(4, 4), stride=(2, 2), padding=(3, 3)
        )
        x = rand(2, 3, 10, 18)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = torch.from_numpy(np.asarray(params["params"]["weight"]))
        b = torch.from_numpy(np.asarray(params["params"]["bias"]))
        got = np.asarray(layer.apply(params, jnp.asarray(x)))
        scale = 1.0 / np.sqrt(5 * 4 * 4)  # fan_in = out*kh*kw (reference convention)
        ref = t2n(
            F.conv_transpose2d(torch.from_numpy(x) * scale, w, b, stride=2, padding=3)
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestModConv:
    @pytest.mark.parametrize("demod", [True, False])
    def test_matches_torch_oracle(self, demod):
        B, I, O, M, H, W = 3, 6, 5, 7, 4, 8
        layer = ops.ModConv2d(
            in_ch=I, out_ch=O, mod_ch=M, ksize=1, stride=1, padding=0, demod=demod
        )
        x = rand(B, I, H, W)
        style = rand(B, M)
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
        got = np.asarray(layer.apply(variables, jnp.asarray(x), jnp.asarray(style)))

        # torch oracle per the documented algorithm (style.py:68-126)
        wq = torch.from_numpy(np.asarray(variables["params"]["weight"]))[None]  # (1,O,I,1,1)
        bias = torch.from_numpy(np.asarray(variables["params"]["bias"])).view(1, O, 1, 1)
        mod_w = torch.from_numpy(np.asarray(variables["params"]["mod"]["weight"]))
        mod_b = torch.from_numpy(np.asarray(variables["params"]["mod"]["bias"]))
        tx = torch.from_numpy(x)
        ts = torch.from_numpy(style)
        s = (ts * (1.0 / np.sqrt(M))) @ mod_w.T + mod_b  # EqualLR linear, gain=lr_mul=1
        weight = (1.0 / np.sqrt(I * 1 * 1)) * wq
        if demod:
            weight = weight / weight.norm(float("inf"), dim=[1, 2, 3], keepdim=True)
            s = s / s.norm(float("inf"), dim=1, keepdim=True)
        s = s.view(B, 1, I, 1, 1) + 1.0
        weight = weight * s
        if demod:
            weight = weight * torch.rsqrt(weight.pow(2).sum(dim=[2, 3, 4], keepdim=True) + 1e-8)
        xx = tx.view(1, B * I, H, W)
        ww = weight.view(B * O, I, 1, 1)
        ref = F.conv2d(xx, ww, None, 1, 0, groups=B).view(B, O, H, W) + bias
        np.testing.assert_allclose(got, t2n(ref), rtol=1e-4, atol=1e-5)

    def test_ema_update(self):
        layer = ops.ModConv2d(in_ch=4, out_ch=4, mod_ch=4, ksize=1, padding=0, ema=True)
        x = jnp.asarray(rand(2, 4, 4, 4)) * 3.0
        s = jnp.asarray(rand(2, 4))
        variables = layer.init(jax.random.PRNGKey(0), x, s)
        assert float(variables["stats"]["ema_var"]) == 1.0
        _, new_state = layer.apply(variables, x, s, train=True, mutable=["stats"])
        var = float(jnp.mean(x**2))
        expected = 1.0 + (1 - 0.9989) * (var - 1.0)
        assert abs(float(new_state["stats"]["ema_var"]) - expected) < 1e-5

    def test_return_weights_folds_gain(self):
        """return_weights must be equivalent to the normal path for any gain:
        x @ w_ret + b_ret == (x @ w + b) * gain (gain applies after bias)."""
        layer = ops.ModConv2d(
            in_ch=4, out_ch=6, mod_ch=4, ksize=1, padding=0, gain=0.5, use_bias=True
        )
        x = jnp.asarray(rand(2, 4, 8, 8))
        s = jnp.asarray(rand(2, 4))
        variables = layer.init(jax.random.PRNGKey(0), x, s)
        ref = layer.apply(variables, x, s)
        wb, b = layer.apply(variables, x, s, return_weights=True)
        fused = jnp.einsum("boi,bihw->bohw", wb, x) + b.reshape(1, -1, 1, 1)
        assert jnp.max(jnp.abs(fused - ref)) < 1e-5

    def test_ksize3_general_path(self):
        layer = ops.ModConv2d(in_ch=4, out_ch=6, mod_ch=4, ksize=3, padding=1)
        x = jnp.asarray(rand(2, 4, 8, 8))
        s = jnp.asarray(rand(2, 4))
        variables = layer.init(jax.random.PRNGKey(0), x, s)
        out = layer.apply(variables, x, s)
        assert out.shape == (2, 6, 8, 8)


class TestFourier:
    def test_shapes_and_periodicity(self):
        res = (8, 64)
        ff = ops.FourierFeature(resolution=res, num_freqs=32)
        angle = jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-0.4, 0.05, res[0]),
                jnp.linspace(-np.pi, np.pi, res[1], endpoint=False),
                indexing="ij",
            ),
            axis=0,
        )[None]
        variables = ff.init(jax.random.PRNGKey(0), angle)
        out = ff.apply(variables, angle)
        assert out.shape == (1, 32, *res)
        # azimuth periodicity: shifting azimuth by 2*pi leaves the encoding unchanged
        angle2 = angle.at[:, 1].add(2 * np.pi)
        out2 = ff.apply(variables, angle2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)
        # freqs_w are from the +-2^k lattice
        fw = np.asarray(variables["consts"]["freqs"])[:, 1]
        valid = {0.0} | {2.0**k for k in range(ff.L_w)} | {-(2.0**k) for k in range(ff.L_w)}
        assert set(np.unique(fw)).issubset(valid)

    def test_logscale(self):
        ff = ops.FourierFeature(resolution=(8, 64), basis_scale="logscale")
        angle = jnp.zeros((1, 2, 8, 64))
        variables = ff.init(jax.random.PRNGKey(0), angle)
        out = ff.apply(variables, angle)
        assert out.shape[1] == ff.out_ch


class TestGumbel:
    def test_straight_through(self):
        logits = jnp.asarray(rand(4, 1, 8, 8) * 3)
        out = ops.gumbel_sigmoid(logits, jax.random.PRNGKey(0))
        vals = np.asarray(out)
        assert set(np.unique(vals)).issubset({0.0, 1.0})

    def test_gradient_flows(self):
        logits = jnp.asarray(rand(4, 1, 8, 8))
        noise = ops.sample_logistic(jax.random.PRNGKey(0), logits.shape)
        f = lambda l: jnp.sum(ops.gumbel_sigmoid(l, logistic_noise=noise))
        g = jax.grad(f)(logits)
        soft = jax.nn.sigmoid(logits + noise)
        np.testing.assert_allclose(np.asarray(g), np.asarray(soft * (1 - soft)), rtol=1e-5)

    def test_matches_torch_relaxed_bernoulli(self):
        # same logistic noise => same soft sample as torch RelaxedBernoulli rsample
        logits = rand(4, 4)
        u = RNG.rand(4, 4).astype(np.float32)
        L = np.log(u) - np.log1p(-u)
        got = ops.gumbel_sigmoid(
            jnp.asarray(logits),
            logistic_noise=jnp.asarray(L),
            temperature=0.7,
            straight_through=False,
        )
        ref = torch.sigmoid((torch.from_numpy(logits) + torch.from_numpy(L)) / 0.7)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-6)


class TestNoise:
    def test_fixed_noise(self):
        layer = ops.NoiseInjection()
        x = jnp.asarray(rand(2, 3, 4, 4))
        noise = jnp.asarray(rand(1, 1, 4, 4))
        variables = layer.init(jax.random.PRNGKey(0), x, fixed_noise=noise)
        out = layer.apply(variables, x, fixed_noise=noise)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))  # weight starts at 0


class TestResampleMatmul:
    """The MXU (dense banded matmul) resampling path must equal the conv path."""

    @pytest.mark.parametrize(
        "up,down,direction,ring",
        [
            (2, 1, "hw", True), (1, 2, "hw", True), (1, 1, "hw", True),
            (2, 1, "hw", False), (1, 2, "w", True), (1, 1, "h", True),
        ],
    )
    def test_matmul_equals_conv(self, up, down, direction, ring):
        x = jnp.asarray(rand(2, 3, 8, 16))
        plan = ops.make_resample(up=up, down=down, ring=ring, direction=direction)
        ref = ops.resample(x, plan, method="conv")
        got = ops.resample(x, plan, method="matmul")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                                   atol=1e-5)

    def test_gradients_match(self):
        x = jnp.asarray(rand(1, 2, 8, 16))
        plan = ops.make_resample(up=2)
        g1 = jax.grad(lambda x: jnp.sum(ops.resample(x, plan, "conv") ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(ops.resample(x, plan, "matmul") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


class TestResamplePlanIdentity:
    """ResamplePlan identity is value-based over the static config, so plan-keyed
    lru_caches (e.g. the _resample_gram Gram factors) hit for directly-constructed
    plans, not only for the interned make_resample instances (r3 advisor finding)."""

    def test_eq_hash_value_based(self):
        from dusty_gan_v2_tpu.ops.resample import ResamplePlan

        a = ResamplePlan(up=2, ring=True, direction="hw")
        b = ResamplePlan(up=2, ring=True, direction="hw")
        c = ResamplePlan(up=2, ring=False, direction="hw")
        assert a == b and hash(a) == hash(b)
        assert a != c
        assert a == ops.make_resample(up=2, ring=True, direction="hw")

    def test_gram_cache_hits_for_direct_plans(self):
        from dusty_gan_v2_tpu.ops.resample import ResamplePlan, _resample_gram

        before = _resample_gram.cache_info()
        x = jnp.asarray(rand(1, 2, 8, 16))
        ops.resample_sumsq(x, ResamplePlan(up=2, ring=True, direction="hw"))
        mid = _resample_gram.cache_info()
        ops.resample_sumsq(x, ResamplePlan(up=2, ring=True, direction="hw"))
        after = _resample_gram.cache_info()
        assert mid.currsize <= before.currsize + 1
        assert after.currsize == mid.currsize  # second direct plan did not add an entry
        assert after.hits >= mid.hits + 1


class TestResampleSumsq:
    """resample_sumsq (Gram-factor form at the LOW resolution) must equal
    sum(resample(x)^2) over the materialized hi-res output — the identity that lets
    train mode use the resample→conv1 commute while keeping the exact ema_var
    statistic (models/dusty_v2.py SynthesisBlock)."""

    @pytest.mark.parametrize("ring", [True, False])
    @pytest.mark.parametrize("shape", [(2, 3, 4, 32), (3, 5, 8, 16), (1, 2, 16, 64)])
    def test_matches_materialized(self, ring, shape):
        x = jnp.asarray(rand(*shape))
        plan = ops.make_resample(up=2, ring=ring, direction="hw")
        y = ops.resample(x, plan)
        ref = float(jnp.sum(jnp.square(y.astype(jnp.float32))))
        got, n = ops.resample_sumsq(x, plan)
        assert n == y.size
        np.testing.assert_allclose(float(got), ref, rtol=1e-5)

    def test_modconv_commute_with_stat(self):
        """ModConv2d(x_op=resample, x_stat=resample_sumsq) == resample AFTER the
        contraction == the old train order (resample then contract), with the SAME
        updated ema_var."""
        B, I, O, M = 3, 6, 5, 7
        plan = ops.make_resample(up=2, ring=True, direction="hw")
        layer = ops.ModConv2d(
            in_ch=I, out_ch=O, mod_ch=M, ksize=1, stride=1, padding=0, ema=True
        )
        x = jnp.asarray(rand(B, I, 4, 16))
        s = jnp.asarray(rand(B, M))
        x_hi = ops.resample(x, plan)
        variables = layer.init(jax.random.PRNGKey(0), x_hi, s)

        ref, st_ref = layer.apply(variables, x_hi, s, train=True, mutable=["stats"])
        got, st_got = layer.apply(
            variables, x, s, train=True, mutable=["stats"],
            x_op=lambda y: ops.resample(y, plan),
            x_stat=ops.resample_sumsq(x, plan),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(st_got["stats"]["ema_var"]), float(st_ref["stats"]["ema_var"]),
            rtol=1e-5,
        )


class TestFractionalShiftMatmul:
    """ops/shift.py: the one-hot-matmul fractional wrap is BIT-EXACT vs the
    take_along_axis form (one-term f32 sums recover the same elements; the lerp
    arithmetic is shared), and its VJP is scatter-free (matmul w/ S^T)."""

    def test_wrap_lerp_impls_bitexact(self):
        from dusty_gan_v2_tpu.ops.shift import fractional_wrap_lerp

        rng = np.random.RandomState(3)
        B, C, H, Ws, Wo = 3, 2, 4, 32, 16
        x = jnp.asarray(rng.randn(B, C, H, Ws).astype(np.float32))
        u = rng.uniform(-40, 40, (B, Wo)).astype(np.float32)
        i0 = jnp.asarray(np.mod(np.floor(u).astype(np.int32), Ws))
        fu = jnp.asarray((u - np.floor(u)).astype(np.float32))[:, None, None, :]

        a = fractional_wrap_lerp(x, i0, fu, impl="matmul")
        b = fractional_wrap_lerp(x, i0, fu, impl="gather")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        ga = jax.grad(lambda t: (fractional_wrap_lerp(t, i0, fu, impl="matmul") ** 2).sum())(x)
        gb = jax.grad(lambda t: (fractional_wrap_lerp(t, i0, fu, impl="gather") ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6, atol=1e-6)

    def test_circular_translate_impls_bitexact(self):
        from dusty_gan_v2_tpu.models.dusty_v2 import circular_translate_w

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 2, 4, 24).astype(np.float32))
        delta = jnp.asarray(np.array([3.37, -11.9], np.float32))
        a = circular_translate_w(x, delta, impl="matmul")
        b = circular_translate_w(x, delta, impl="gather")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        ga = jax.grad(lambda t: (circular_translate_w(t, delta, impl="matmul") ** 2).sum())(x)
        gb = jax.grad(lambda t: (circular_translate_w(t, delta, impl="gather") ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6, atol=1e-6)

    def test_bf16_matches_gather_form(self):
        from dusty_gan_v2_tpu.ops.shift import fractional_wrap_lerp

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 1, 4, 32).astype(np.float32)).astype(jnp.bfloat16)
        u = rng.uniform(0, 32, (2, 8)).astype(np.float32)
        i0 = jnp.asarray(np.mod(np.floor(u).astype(np.int32), 32))
        fu = jnp.asarray((u - np.floor(u))).astype(jnp.bfloat16)[:, None, None, :]
        a = fractional_wrap_lerp(x, i0, fu, impl="matmul")
        b = fractional_wrap_lerp(x, i0, fu, impl="gather")
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
