"""Convergence smoke: train a tiny dusty_v2 GAN on synthetic structured range images
and verify the generated distribution moves toward the data.

The data are noise-free pseudo-range images with one dominant factor of variation
(a global depth scale on a fixed ground-plane-like row profile) plus a random box
obstacle — cheap insurance against loss-sign/scale bugs that single-step tests can't
see (reference counterpart: 25M-img KITTI runs, configs/gans/dusty_v2.yaml).

    python scripts/convergence_smoke.py [--steps 500] [--out artifacts/convergence.csv]

Writes a per-step loss CSV plus init/final Frechet feature distances, and exits
non-zero if the final distance hasn't improved by at least 2x.
"""

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_synthetic_batch(rng: np.random.RandomState, B: int, res):
    """Ground-plane row profile scaled per-sample + one constant-depth box."""
    H, W = res
    rows = np.linspace(8.0, 60.0, H, dtype=np.float32)[::-1]  # far at top
    depth = np.tile(rows[None, :, None], (B, 1, W)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (B, 1, 1)).astype(np.float32)
    depth = depth * scale
    for b in range(B):
        h0 = rng.randint(0, H // 2)
        w0 = rng.randint(0, W - W // 4)
        depth[b, h0:h0 + H // 3, w0:w0 + W // 4] = rng.uniform(3.0, 10.0)
    depth = np.clip(depth, 2.0, 79.0)
    mask = (rng.rand(B, H, W) > 0.05).astype(np.float32)
    return {"depth": depth[:, None], "mask": mask[:, None]}


def feats_of(img: np.ndarray) -> np.ndarray:
    """Cheap per-image features: global mean/std + 8-bin row profile (tanh space)."""
    B, _, H, W = img.shape
    x = img.reshape(B, H, W)
    prof = x.mean(axis=2)  # (B, H)
    bins = prof.reshape(B, 8, H // 8).mean(axis=2)
    return np.concatenate(
        [x.mean((1, 2))[:, None], x.std((1, 2))[:, None], bins], axis=1
    )


def frechet(a: np.ndarray, b: np.ndarray) -> float:
    """Frechet distance between feature gaussians (scipy-free: eigendecomp sqrtm)."""
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False) + 1e-6 * np.eye(a.shape[1])
    cb = np.cov(b, rowvar=False) + 1e-6 * np.eye(b.shape[1])
    # sqrtm(ca @ cb) via symmetric-form eigendecomposition
    wa, va = np.linalg.eigh(ca)
    sa = (va * np.sqrt(np.maximum(wa, 0))) @ va.T
    m = sa @ cb @ sa
    wm = np.linalg.eigvalsh(m)
    tr_sqrt = np.sqrt(np.maximum(wm, 0)).sum()
    return float(((mu_a - mu_b) ** 2).sum() + np.trace(ca) + np.trace(cb) - 2 * tr_sqrt)


def _full_cfg(res, batch, seed, dtype):
    """The shipped 64x512 dusty_v2 training config, pointed at synthetic data.

    Differences from configs/gans/dusty_v2.yaml: batch/total_kimg for a short run,
    warmup fade off (it would span the whole smoke), ema_kimg shortened so G_ema
    actually tracks within the run.
    """
    from dusty_gan_v2_tpu.utils.config import load_config

    cfg = load_config("configs/gans/dusty_v2.yaml")
    cfg.dataset.name = "synthetic"
    cfg.training.random_seed = seed
    cfg.training.batch_size = batch
    cfg.training.total_kimg = 10_000
    cfg.training.ema_kimg = 20
    cfg.training.ema_rampup = 0.05
    cfg.training.warmup.fade_kimg = 0
    cfg.training.warmup.blur_init_sigma = 0
    cfg.training.warmup.dropout_init_ratio = 0.0
    cfg.model.generator.synthesis_kwargs.resolution = list(res)
    cfg.model.discriminator.layer_kwargs.resolution = list(res)
    cfg.model.generator.compute_dtype = dtype
    cfg.model.discriminator.layer_kwargs.compute_dtype = dtype
    return cfg


def run(steps: int, out_csv, res=(16, 64), batch=8, seed=0, log_every=10,
        n_eval=128, dtype="float32", full=False):
    import jax
    import jax.numpy as jnp

    from dusty_gan_v2_tpu.parallel import make_mesh
    from dusty_gan_v2_tpu.training import Trainer
    from dusty_gan_v2_tpu.utils.config import Config

    cfg = _full_cfg(res, batch, seed, dtype) if full else Config(
        {
            "dataset": {"name": "synthetic", "min_depth": 1.45, "max_depth": 80,
                        "raydrop_const": -1},
            "training": {
                "random_seed": seed, "total_kimg": 10, "ema_kimg": 1,
                "ema_rampup": 0.05, "batch_size": batch, "gan_objective": "nsgan",
                "loss": {"gan": 1, "gp": 1, "pl": 1},
                "lazy": {"gp": 16, "pl": 4, "ada": 4},
                "lr": {
                    "generator": {"alpha": 0.0025, "beta1": 0, "beta2": 0.99},
                    "discriminator": {"alpha": 0.0025, "beta1": 0, "beta2": 0.99},
                },
                "augment": {
                    "p_init": 0.0, "p_target": 0.6, "kimg": 500,
                    "policy": {"lr_flip": 1, "int_trans": 1, "brightness": 1,
                               "contrast": 1},
                },
                "warmup": {"fade_kimg": 0, "blur_init_sigma": 0,
                           "dropout_init_ratio": 0.0},
            },
            "model": {
                "generator": {
                    "arch": "dusty_v2",
                    "mapping_kwargs": {"in_ch": 32, "out_ch": 32, "depth": 2},
                    "synthesis_kwargs": {
                        "in_ch": 32,
                        "out_ch": [
                            {"name": "image", "ch": 1, "act": "tanh"},
                            {"name": "raydrop_logit", "ch": 1, "act": None},
                        ],
                        "ch_base": 8, "ch_max": 32, "resolution": list(res),
                        "layers": [2, 2], "ring": True, "use_noise": False,
                        "aug_coords": True,
                    },
                    "measurement_kwargs": {"raydrop_const": -1,
                                           "gumbel_temperature": 1},
                },
                "discriminator": {
                    "arch": "dusty_v2",
                    "layer_kwargs": {
                        "in_ch": 1, "ring": True, "ch_base": 8, "ch_max": 32,
                        "resolution": list(res), "mbdis_group": 4, "mbdis_feat": 1,
                        "pre_blur": True,
                    },
                },
            },
        }
    )

    cfg.model.generator.compute_dtype = dtype
    cfg.model.discriminator.layer_kwargs.compute_dtype = dtype

    elev = np.linspace(0.05, -0.41, res[0], dtype=np.float32)
    azim = np.linspace(np.pi, -np.pi, res[1], endpoint=False, dtype=np.float32)
    angle = jnp.asarray(np.stack(np.meshgrid(elev, azim, indexing="ij"), 0)[None])

    mesh = make_mesh(jax.devices()[:1])
    t = Trainer(cfg, mesh=mesh, angle=angle)
    state = t.init_state(jax.random.PRNGKey(seed))

    rng = np.random.RandomState(seed)
    from dusty_gan_v2_tpu.training.trainer import fetch_reals

    def gen_images(state, n):
        imgs = []
        for i in range(0, n, batch):
            z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(77), i),
                                  (batch, t.z_dim))
            o = t.sample(state, z, jax.random.PRNGKey(13), ema=True)
            imgs.append(np.asarray(o["image"]))
        return np.concatenate(imgs)[:n]

    real_eval = make_synthetic_batch(np.random.RandomState(991), n_eval, res)
    real_tanh = np.asarray(
        fetch_reals({k: jnp.asarray(v) for k, v in real_eval.items()},
                    1.45, 80.0, -1.0)["image"]
    )
    rf = feats_of(real_tanh)

    fd_init = frechet(feats_of(gen_images(state, n_eval)), rf)
    rows = []
    for i in range(1, steps + 1):
        batch_np = make_synthetic_batch(rng, batch, res)
        state, metrics = t.step(
            state, {k: jnp.asarray(v) for k, v in batch_np.items()},
            jax.random.PRNGKey(1), i,  # per-iteration fold happens in-jit
        )
        if i % log_every == 0 or i == 1:
            rows.append({"step": i, **{k: float(v) for k, v in metrics.items()}})

    fd_final = frechet(feats_of(gen_images(state, n_eval)), rf)

    if out_csv:
        out = Path(out_csv)
        out.parent.mkdir(parents=True, exist_ok=True)
        keys = sorted({k for r in rows for k in r})
        with open(out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
            f.write(f"# frechet_feature_distance init={fd_init:.4f} "
                    f"final={fd_final:.4f}\n")
    print(f"frechet feature distance: init={fd_init:.4f} final={fd_final:.4f} "
          f"(ratio {fd_final / max(fd_init, 1e-9):.3f})")
    return fd_init, fd_final


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--out", default="artifacts/convergence.csv")
    p.add_argument("--dtype", default="float32",
                   help="compute dtype policy for G and D (bfloat16 validates the "
                        "mixed-precision training recipe; see BASELINE.md)")
    p.add_argument("--full", action="store_true",
                   help="run the shipped full-size 64x512 dusty_v2 config (bf16 "
                        "B=128 recipe scale) instead of the tiny 16x64 model")
    p.add_argument("--batch", type=int, default=None)
    args = p.parse_args()
    kw = {}
    if args.full:
        kw = dict(res=(64, 512), batch=args.batch or 128, full=True, log_every=25)
    elif args.batch:
        kw["batch"] = args.batch
    fd_init, fd_final = run(args.steps, args.out, dtype=args.dtype, **kw)
    if not fd_final < 0.5 * fd_init:
        print("FAIL: generated distribution did not move toward the data")
        sys.exit(1)


if __name__ == "__main__":
    main()
