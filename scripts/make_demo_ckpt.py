"""Create a fresh-init dusty_v2 checkpoint for driving the eval CLIs.

Builds the shipped config's models on CPU, inits the full GANTrainState, and
writes the production single-file msgpack checkpoint (training/checkpoint.py)
with the dataset root pointed at a given KITTI-layout directory — enough for
test_gan.py to run the complete WACV'23 metric protocol end-to-end (metric
VALUES are random-weight outputs; the pipeline and its wall-clock are real).
Used to ground the 2048x2048 1-NNA-EMD stage on-chip (reference
test_gan.py:228-237) without the unreachable released weights.

    python scripts/make_demo_ckpt.py --out /tmp/demo_ckpt.msgpack \
        --data_root /tmp/kitti_synth [--config configs/gans/dusty_v2.yaml]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--config", default="configs/gans/dusty_v2.yaml")
    p.add_argument("--data_root", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # init on host; ckpt is portable

    from dusty_gan_v2_tpu.training import Trainer
    from dusty_gan_v2_tpu.training.checkpoint import save_checkpoint
    from dusty_gan_v2_tpu.utils.config import load_config

    cfg = load_config(args.config)
    cfg.dataset.root = args.data_root
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    save_checkpoint(args.out, cfg, state, trainer.angle, 0)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
