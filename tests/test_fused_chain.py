"""Pallas fused act->resample chain vs the unfused reference pair.

Runs in Pallas interpret mode on CPU (the TPU lowering is exercised by
scripts/bench_dfuse.py and the training step when the fused path is enabled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dusty_gan_v2_tpu.ops import make_resample, resample
from dusty_gan_v2_tpu.ops.act import fused_leaky_relu
from dusty_gan_v2_tpu.ops.fused_chain import fused_act_resample, pallas_resample


def _ref(x, b, plan):
    return resample(fused_leaky_relu(x, b), plan, method="matmul")


@pytest.mark.parametrize(
    "shape,up,down",
    [
        ((2, 4, 8, 16), 1, 1),    # blur (D resblock main/skip)
        ((2, 4, 8, 16), 2, 1),    # 2x up (G block)
        ((2, 4, 8, 16), 1, 2),    # 2x down
        ((3, 2, 6, 12), 1, 1),    # odd plane count -> P=1 tiles
    ],
)
def test_fused_act_resample_fwd(shape, up, down):
    plan = make_resample(up=up, down=down, window=(1, 3, 3, 1), ring=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(shape[1]).astype(np.float32))
    got = fused_act_resample(x, b, plan)
    want = _ref(x, b, plan)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_act_resample_grads():
    plan = make_resample(window=(1, 3, 3, 1), ring=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)
    co = jnp.asarray(rng.randn(*_ref(x, b, plan).shape).astype(np.float32))

    def loss_fused(x, b):
        return jnp.sum(fused_act_resample(x, b, plan) * co)

    def loss_ref(x, b):
        return jnp.sum(_ref(x, b, plan) * co)

    gx1, gb1 = jax.grad(loss_fused, argnums=(0, 1))(x, b)
    gx2, gb2 = jax.grad(loss_ref, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2)])
def test_pallas_resample(up, down):
    plan = make_resample(up=up, down=down, window=(1, 3, 3, 1), ring=True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32))
    got = pallas_resample(x, plan)
    want = resample(x, plan, method="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    co = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(pallas_resample(v, plan) * co))(x)
    g2 = jax.grad(lambda v: jnp.sum(resample(v, plan, method="matmul") * co))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-5)
