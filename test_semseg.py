"""Evaluate a semseg checkpoint on KITTIRawFrontal val with per-class IoU table.

Equivalent of reference test_semseg.py:55-160: omit-cyclist 3-class protocol, optional
kNN post-filter, per-class IoU/precision/recall. Accepts our msgpack checkpoints or the
released torch `.pth` (converted on the fly) / pretrained keywords.

    python test_semseg.py --ckpt_path <ckpt> [--knn]
"""

import argparse
import json
import os
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from dusty_gan_v2_tpu.datasets.kitti import Prefetcher
from dusty_gan_v2_tpu.semseg import KITTIRawFrontal, knn2d
from dusty_gan_v2_tpu.utils.config import Config

_TAG = "weights-wacv23"
_ROOT = f"https://github.com/kazuto1011/dusty-gan-v2/releases/download/{_TAG}/"
PRETRAINED_SEMSEG = {
    "clean": _ROOT + "squeezesegv2_gtav_clean_50k.pth",
    "uniform": _ROOT + "squeezesegv2_gtav_uniform_50k.pth",
    "spatial": _ROOT + "squeezesegv2_gtav_spatial_50k.pth",
    "dusty_v1": _ROOT + "squeezesegv2_gtav_dustyv1_50k.pth",
    "dusty_v2": _ROOT + "squeezesegv2_gtav_dustyv2_50k.pth",
    "real": _ROOT + "squeezesegv2_kitti_50k.pth",
}


def load_semseg_ckpt(name_or_path):
    from dusty_gan_v2_tpu.convert.torch_weights import convert_squeezeseg_state

    if name_or_path in PRETRAINED_SEMSEG:
        import torch.hub

        ckpt = torch.hub.load_state_dict_from_url(
            PRETRAINED_SEMSEG[name_or_path], progress=True
        )
        cfg = ckpt["cfg"]
        if not isinstance(cfg, dict):
            from omegaconf import OmegaConf  # pragma: no cover

            cfg = OmegaConf.to_container(cfg)
        params, stats = convert_squeezeseg_state(ckpt["model"])
        return Config(cfg), params, stats
    assert os.path.exists(name_or_path), name_or_path
    if name_or_path.endswith(".pth"):
        import torch

        ckpt = torch.load(name_or_path, map_location="cpu")
        cfg = ckpt["cfg"]
        if not isinstance(cfg, dict):
            from omegaconf import OmegaConf  # pragma: no cover

            cfg = OmegaConf.to_container(cfg)
        params, stats = convert_squeezeseg_state(ckpt["model"])
        return Config(cfg), params, stats
    import flax.serialization

    with open(name_or_path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    cfg = Config(json.loads(payload["cfg_yaml"]))
    return cfg, payload["params"], payload["batch_stats"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--dataset_root", default="data/kitti_raw_frontal")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--knn", action="store_true", dest="knn_enabled")
    parser.add_argument("--knn_k", type=int, default=3)
    parser.add_argument("--knn_kernel_size", type=int, default=3)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    cfg, params, batch_stats = load_semseg_ckpt(args.ckpt_path)
    # import OUR sibling train_semseg by path: a plain name import can resolve to
    # the reference repo's script when tests put /root/reference on sys.path
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "_our_train_semseg",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_semseg.py"),
    )
    _ts = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_ts)
    MODALITY_CH, build_model, evaluate_confusion, make_inputs = (
        _ts.MODALITY_CH, _ts.build_model, _ts.evaluate_confusion, _ts.make_inputs)

    model = build_model(cfg)
    num_classes = int(cfg.dataset.num_classes)
    modalities = tuple(cfg.arch.inputs)

    ds = KITTIRawFrontal(root=args.dataset_root, split="val",
                         shape=tuple(cfg.dataset.shape), omit_cyclist=True)

    @jax.jit
    def predict(x, xyz, mask, depth):
        logit = model.apply({"params": params, "batch_stats": batch_stats}, x, xyz, mask)
        pred = jnp.argmax(logit, axis=1)
        pred = jnp.where(pred == 3, 0, pred)  # omit cyclist (test_semseg.py:130)
        if args.knn_enabled:
            # inside the jit: knn2d is a ~30-op elementwise chain, eager it costs
            # a device round-trip per op per batch on tunnel-attached TPUs
            pred = knn2d(
                depth, pred, num_classes, k=args.knn_k,
                kernel_size=(args.knn_kernel_size,) * 2,
            )
        return pred

    conf = defaultdict(lambda: np.zeros(num_classes))
    for raw in Prefetcher(ds, args.batch_size, num_workers=4):
        b = {k: jnp.asarray(v) for k, v in raw.items()}
        pred = predict(make_inputs(b, modalities), b["xyz"], b["mask"], b["depth"])
        pred = np.asarray(pred) * raw["mask"]
        label = raw["label"] * raw["mask"]
        tps, fps, fns = evaluate_confusion(label, pred, num_classes)
        conf["tp"] += tps
        conf["fp"] += fps
        conf["fn"] += fns

    eps = 1e-12
    iou = conf["tp"] / (conf["tp"] + conf["fn"] + conf["fp"] + eps)
    precision = conf["tp"] / (conf["tp"] + conf["fp"] + eps)
    recall = conf["tp"] / (conf["tp"] + conf["fn"] + eps)
    print(f"{'class':>12} {'iou':>8} {'precision':>10} {'recall':>8}")
    for i, name in enumerate(ds.class_list):
        print(f"{name:>12} {iou[i]:8.1%} {precision[i]:10.1%} {recall[i]:8.1%}")
    print(f"{'mean':>12} {iou[1:3].mean():8.1%} {precision[1:3].mean():10.1%} "
          f"{recall[1:3].mean():8.1%}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"iou": iou.tolist(), "precision": precision.tolist(),
                       "recall": recall.tolist()}, f, indent=2)


if __name__ == "__main__":
    main()
