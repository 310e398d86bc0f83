"""End-to-end weight-conversion parity: the actual reference torch models (run on CPU
via the stubbed extension loader) vs our JAX models with converted weights.

This is the test backing the BASELINE.md goal "pretrained dusty_v2 sampling matches
reference range images to <= 1e-4": the same conversion path used for the released
checkpoints is exercised with randomly initialized reference models.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_models import load_reference_gans

from dusty_gan_v2_tpu.convert.torch_weights import (
    convert_discriminator_state,
    convert_generator_state,
)
from dusty_gan_v2_tpu.models import build_discriminator, build_generator

REF = load_reference_gans()
RES = (16, 128)
ZDIM = 64

V2_SYN = {
    "in_ch": ZDIM,
    "out_ch": [
        {"name": "image", "ch": 1, "act": "nn.Tanh"},
        {"name": "raydrop_logit", "ch": 1, "act": None},
    ],
    "ch_base": 8,
    "ch_max": 64,
    "resolution": RES,
    "layers": [2, 2, 2, 2],
    "ring": True,
    "num_fp16_layers": 0,
    "use_noise": False,
    "pe_type": "random",
    "pe_scale_offset": (3, -1),
    "aug_coords": True,
    "aug_coords_blitting": False,
}


def make_angle(res, batch=1):
    elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
    azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
    grid = np.stack(np.meshgrid(elev, azim, indexing="ij"), axis=0)[None]
    return np.repeat(grid, batch, axis=0)


class TestDustyV2Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(0)
        tG = REF.dusty_v2.Generator(
            mapping_kwargs={"in_ch": ZDIM, "out_ch": ZDIM, "depth": 2},
            synthesis_kwargs=dict(V2_SYN),
            measurement_kwargs={"raydrop_const": -1, "gumbel_temperature": 1},
        ).eval()
        # randomize buffers that matter for eval parity
        with torch.no_grad():
            tG.w_avg.normal_(0, 0.3)
            for name, buf in tG.named_buffers():
                if name.endswith("ema_var"):
                    buf.uniform_(0.5, 2.0)

        params, stats, consts = convert_generator_state(tG.state_dict(), "dusty_v2")
        jG = build_generator(
            {
                "arch": "dusty_v2",
                "mapping_kwargs": {"in_ch": ZDIM, "out_ch": ZDIM, "depth": 2},
                "synthesis_kwargs": {
                    **{k: v for k, v in V2_SYN.items() if k != "num_fp16_layers"},
                    "out_ch": tuple(
                        {"name": o["name"], "ch": o["ch"],
                         "act": "tanh" if o["act"] == "nn.Tanh" else None}
                        for o in V2_SYN["out_ch"]
                    ),
                },
                "measurement_kwargs": {"raydrop_const": -1, "gumbel_temperature": 1},
            }
        )
        variables = {"params": params, "stats": stats, "consts": consts}
        return tG, jG, variables

    @pytest.mark.parametrize("psi", [1.0, 0.7])
    def test_eval_outputs_match(self, pair, psi):
        tG, jG, variables = pair
        B = 3
        z = np.random.RandomState(1).randn(B, ZDIM).astype(np.float32)
        angle = make_angle(RES, B)
        with torch.no_grad():
            ref = tG(torch.from_numpy(z), angle=torch.from_numpy(angle),
                     truncation_psi=psi)
        got = jG.apply(
            variables, jnp.asarray(z), jnp.asarray(angle), truncation_psi=psi,
            gumbel_noise=jnp.zeros((B, 1, *RES)),
        )
        for key in ("image_orig", "raydrop_logit", "w"):
            np.testing.assert_allclose(
                np.asarray(got[key]), ref[key].numpy(), atol=1e-4,
                err_msg=f"mismatch in {key} (psi={psi})",
            )

    def test_input_w_match(self, pair):
        tG, jG, variables = pair
        B = 2
        w = np.random.RandomState(2).randn(B, 10, ZDIM).astype(np.float32)
        angle = make_angle(RES, B)
        with torch.no_grad():
            ref = tG(torch.from_numpy(w), angle=torch.from_numpy(angle), input_w=True)
        got = jG.apply(
            variables, jnp.asarray(w), jnp.asarray(angle), input_w=True,
            gumbel_noise=jnp.zeros((B, 1, *RES)),
        )
        np.testing.assert_allclose(
            np.asarray(got["image_orig"]), ref["image_orig"].numpy(), atol=1e-4
        )

    def test_raydrop_composite_with_same_noise(self, pair):
        tG, jG, variables = pair
        B = 2
        z = np.random.RandomState(3).randn(B, ZDIM).astype(np.float32)
        angle = make_angle(RES, B)
        # fix the reference gumbel via the same logistic noise injection trick
        u = np.random.RandomState(4).rand(B, 1, *RES).astype(np.float32)
        L = np.log(u) - np.log1p(-u)

        logits_holder = {}

        def hook(module, args, output):
            logits = args[0]
            soft = torch.sigmoid((logits + torch.from_numpy(L)) / 1.0)
            hard = (soft > 0.5).to(logits)
            return (hard - soft).detach() + soft

        h = tG.measurement_model.gumbel_sigmoid.register_forward_hook(hook)
        with torch.no_grad():
            ref = tG(torch.from_numpy(z), angle=torch.from_numpy(angle))
        h.remove()

        got = jG.apply(
            variables, jnp.asarray(z), jnp.asarray(angle),
            gumbel_noise=jnp.asarray(L),
        )
        np.testing.assert_allclose(
            np.asarray(got["raydrop_mask"]), ref["raydrop_mask"].numpy(), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(got["image"]), ref["image"].numpy(), atol=1e-4
        )


class TestDustyV2DiscriminatorParity:
    # NOTE: the reference D epilogue hardcodes ch(4), so it only runs at 64-high inputs
    RES_D = (64, 128)

    def test_logits_match(self):
        RES = self.RES_D
        torch.manual_seed(0)
        tD = REF.dusty_v2.Discriminator(
            in_ch=1, ch_base=8, ch_max=64, resolution=RES,
            mbdis_group=4, mbdis_feat=1, num_fp16_layers=0, pre_blur=True, ring=True,
        ).eval()
        params = convert_discriminator_state(tD.state_dict(), "dusty_v2")
        jD = build_discriminator(
            {
                "arch": "dusty_v2",
                "layer_kwargs": {
                    "in_ch": 1, "ch_base": 8, "ch_max": 64, "resolution": RES,
                    "mbdis_group": 4, "mbdis_feat": 1, "pre_blur": True, "ring": True,
                },
            }
        )
        x = np.random.RandomState(5).randn(4, 1, *RES).astype(np.float32)
        with torch.no_grad():
            ref = tD(torch.from_numpy(x)).numpy()
        got = np.asarray(jD.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-4)


class TestVanillaParity:
    RES_V = (64, 128)

    def test_generator_match(self):
        torch.manual_seed(0)
        syn = {
            "in_ch": ZDIM,
            "out_ch": [{"name": "image", "ch": 1, "act": None}],
            "ch_base": 8,
            "ch_max": 64,
            "resolution": self.RES_V,
            "ring": True,
        }
        tG = REF.vanilla.Generator(synthesis_kwargs=dict(syn)).eval()
        with torch.no_grad():
            tG.w_avg.normal_(0, 0.3)
        params, stats, consts = convert_generator_state(tG.state_dict(), "vanilla")
        jG = build_generator(
            {"arch": "vanilla",
             "synthesis_kwargs": {**syn, "out_ch": tuple(
                 {"name": "image", "ch": 1, "act": None} for _ in range(1))}}
        )
        z = np.random.RandomState(6).randn(2, ZDIM).astype(np.float32)
        with torch.no_grad():
            ref = tG(torch.from_numpy(z), truncation_psi=0.7)
        got = jG.apply(
            {"params": params, "stats": stats}, jnp.asarray(z), truncation_psi=0.7
        )
        np.testing.assert_allclose(
            np.asarray(got["image"]), ref["image"].numpy(), atol=1e-4
        )

    def test_discriminator_match(self):
        torch.manual_seed(0)
        tD = REF.vanilla.Discriminator(
            in_ch=1, ch_base=8, ch_max=64, resolution=self.RES_V, ring=True
        ).eval()
        params = convert_discriminator_state(tD.state_dict(), "vanilla")
        jD = build_discriminator(
            {"arch": "vanilla",
             "layer_kwargs": {"in_ch": 1, "ch_base": 8, "ch_max": 64,
                              "resolution": self.RES_V, "ring": True}}
        )
        x = np.random.RandomState(7).randn(2, 1, *self.RES_V).astype(np.float32)
        with torch.no_grad():
            ref = tD(torch.from_numpy(x)).numpy()
        got = np.asarray(jD.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-4)
