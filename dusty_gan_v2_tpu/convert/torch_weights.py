"""Released-checkpoint conversion: reference torch state_dicts -> our flax variables.

The WACV'23 release ships `.pth` files whose G/G_ema/D state_dicts follow the reference
module structure (gans/models/*.py). This module renames/reshapes them into our
{params, stats, consts} trees so pretrained sampling parity is a pure data transform.

Layout conventions (both sides):
  Linear (out,in) / Conv2d (O,I,kh,kw) / ConvTranspose2d (I,O,kh,kw) — identical, so no
  transposition is needed; ModConv weights drop the leading broadcast dim (1,O,I,k,k) ->
  (O,I,k,k); FusedLeakyReLU biases are 1-D; per-head biases (1,O,1,1) -> (O,).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "convert_generator_state",
    "convert_discriminator_state",
    "load_reference_checkpoint",
]


def _to_np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_generator_state(
    state_dict: Dict[str, Any], arch: str
) -> Tuple[Dict, Dict, Dict]:
    """torch G state_dict -> (params, stats, consts) matching our Generator modules."""
    params: Dict = {}
    stats: Dict = {}
    consts: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return _to_np(state_dict[key])

    sd_keys = list(state_dict.keys())

    # shared w_avg buffer
    if "w_avg" in state_dict:
        _set(stats, ("w_avg",), take("w_avg"))

    if arch == "dusty_v2":
        # mapping network: Sequential[PixelNorm, Seq(EqualLR, LReLU), Seq(...)]
        depth = 0
        while f"mapping_network.{depth + 1}.0.module.weight" in state_dict:
            i = depth + 1
            _set(params, ("mapping_network", f"fc{depth}", "weight"),
                 take(f"mapping_network.{i}.0.module.weight"))
            _set(params, ("mapping_network", f"fc{depth}", "bias"),
                 take(f"mapping_network.{i}.0.module.bias"))
            depth += 1

        # synthesis blocks
        blocks = sorted(
            {int(k.split(".")[2]) for k in sd_keys if k.startswith("synthesis_network.layers.")}
        )
        for b in blocks:
            pre = f"synthesis_network.layers.{b}"
            mine = ("synthesis_network", f"b{b}")
            if f"{pre}.pe.freqs" in state_dict:
                freqs = take(f"{pre}.pe.freqs")  # (F2, 2, 1, 1)
                _set(consts, (*mine, "pe", "freqs"), freqs.reshape(freqs.shape[0], -1))
                _set(consts, (*mine, "pe", "phase"), take(f"{pre}.pe.phase"))
            for conv in ("conv1", "conv2"):
                wkey = f"{pre}.{conv}.weight"
                if wkey not in state_dict:
                    continue
                w = take(wkey)  # (1,O,I,k,k)
                _set(params, (*mine, conv, "weight"), w[0])
                _set(params, (*mine, conv, "mod", "weight"),
                     take(f"{pre}.{conv}.mod.module.weight"))
                _set(params, (*mine, conv, "mod", "bias"),
                     take(f"{pre}.{conv}.mod.module.bias"))
                if f"{pre}.{conv}.bias" in state_dict:
                    _set(params, (*mine, conv, "bias"),
                         take(f"{pre}.{conv}.bias").reshape(-1))
                if f"{pre}.{conv}.ema_var" in state_dict:
                    _set(stats, (*mine, conv, "ema_var"), take(f"{pre}.{conv}.ema_var"))
            for na in ("noise1", "noise2"):
                if f"{pre}.{na}.weight" in state_dict:
                    _set(params, (*mine, na, "weight"), take(f"{pre}.{na}.weight"))
            for act in ("bias_act1", "bias_act2"):
                if f"{pre}.{act}.bias" in state_dict:
                    _set(params, (*mine, act, "bias"), take(f"{pre}.{act}.bias"))
            # heads
            head_names = sorted(
                {
                    k[len(f"{pre}.head.heads.") :].split(".")[0]
                    for k in sd_keys
                    if k.startswith(f"{pre}.head.heads.")
                }
            )
            for hn in head_names:
                hpre = f"{pre}.head.heads.{hn}"
                w = take(f"{hpre}.weight")
                _set(params, (*mine, "head", hn, "weight"), w[0])
                if f"{hpre}.bias" in state_dict:
                    _set(params, (*mine, "head", hn, "bias"),
                         take(f"{hpre}.bias").reshape(-1))
                _set(params, (*mine, "head", hn, "mod", "weight"),
                     take(f"{hpre}.mod.module.weight"))
                _set(params, (*mine, "head", hn, "mod", "bias"),
                     take(f"{hpre}.mod.module.bias"))
                if f"{hpre}.ema_var" in state_dict:
                    _set(stats, (*mine, "head", hn, "ema_var"), take(f"{hpre}.ema_var"))

    elif arch in ("vanilla", "dusty_v1"):
        # synthesis: Sequential[Projection, Up x3, Head]
        _set(params, ("synthesis_network", "projection", "conv", "weight"),
             take("synthesis_network.0.1.module.weight"))
        _set(params, ("synthesis_network", "projection", "act", "bias"),
             take("synthesis_network.0.2.bias"))
        for i, name in ((1, "up1"), (2, "up2"), (3, "up3")):
            _set(params, ("synthesis_network", name, "conv", "weight"),
                 take(f"synthesis_network.{i}.1.module.weight"))
            _set(params, ("synthesis_network", name, "act", "bias"),
                 take(f"synthesis_network.{i}.2.bias"))
        head_names = sorted(
            {
                k[len("synthesis_network.4.heads.") :].split(".")[0]
                for k in sd_keys
                if k.startswith("synthesis_network.4.heads.")
            }
        )
        for hn in head_names:
            _set(params, ("synthesis_network", "head", hn, "weight"),
                 take(f"synthesis_network.4.heads.{hn}.1.module.weight"))
            _set(params, ("synthesis_network", "head", hn, "bias"),
                 take(f"synthesis_network.4.heads.{hn}.1.module.bias"))
    else:
        raise NotImplementedError(arch)

    # anything not consumed should be a known buffer (resample kernels, consts)
    leftovers = [
        k
        for k in sd_keys
        if k not in consumed
        and not any(
            t in k
            for t in (
                "resample.kernel", "downsample.kernel", "raydrop_const", "kernel",
            )
        )
    ]
    if leftovers:
        raise KeyError(f"unconverted generator keys: {leftovers}")
    return params, stats, consts


def convert_discriminator_state(state_dict: Dict[str, Any], arch: str) -> Dict:
    params: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return _to_np(state_dict[key])

    sd_keys = list(state_dict.keys())

    if arch == "dusty_v2":
        _set(params, ("stem", "conv", "weight"), take("layers.1.0.module.weight"))
        _set(params, ("stem_act", "bias"), take("layers.2.bias"))
        res_ids = sorted(
            {
                int(k.split(".")[1])
                for k in sd_keys
                if k.startswith("layers.") and ".conv1." in k
            }
        )
        for j, tid in enumerate(res_ids):
            pre = f"layers.{tid}"
            _set(params, (f"res{j}", "conv1", "conv", "weight"),
                 take(f"{pre}.conv1.1.module.weight"))
            _set(params, (f"res{j}", "bias_act1", "bias"), take(f"{pre}.bias_act1.bias"))
            _set(params, (f"res{j}", "conv2", "conv", "weight"),
                 take(f"{pre}.conv2.1.module.weight"))
            _set(params, (f"res{j}", "bias_act2", "bias"), take(f"{pre}.bias_act2.bias"))
            _set(params, (f"res{j}", "skip", "conv", "weight"),
                 take(f"{pre}.skip.0.module.weight"))
        _set(params, ("epi_conv", "conv", "weight"), take("epilogue.1.1.module.weight"))
        _set(params, ("epi_act1", "bias"), take("epilogue.2.bias"))
        _set(params, ("fc1", "weight"), take("epilogue.4.module.weight"))
        _set(params, ("epi_act2", "bias"), take("epilogue.5.bias"))
        _set(params, ("fc2", "weight"), take("epilogue.6.module.weight"))
        _set(params, ("fc2", "bias"), take("epilogue.6.module.bias"))
    elif arch == "vanilla":
        for i, name in ((1, "down1"), (2, "down2"), (3, "down3"), (4, "down4")):
            _set(params, (name, "conv", "weight"), take(f"{i}.1.module.weight"))
            _set(params, (name, "act", "bias"), take(f"{i}.2.bias"))
        _set(params, ("final", "weight"), take("5.module.weight"))
        _set(params, ("final", "bias"), take("5.module.bias"))
    else:
        raise NotImplementedError(arch)

    leftovers = [k for k in sd_keys if k not in consumed and "kernel" not in k]
    if leftovers:
        raise KeyError(f"unconverted discriminator keys: {leftovers}")
    return params


def convert_squeezeseg_state(state_dict: Dict[str, Any], arch: str = "squeezeseg_v2"):
    """Reference SqueezeSeg V1/V2 torch state_dict -> (params, batch_stats) trees.

    V2 torch layout (squeezeseg_v2.py:59-161): encoder/decoder ModuleDicts of Sequential
    blocks; ConvReLUNorm = Sequential(conv, relu, bn); CAM.attn =
    Sequential(maxpool, conv, relu, conv, sigmoid).
    V1 torch layout (squeezeseg_v1.py:27-113): flat attributes, ConvReLU =
    Sequential(conv, relu) — no BatchNorm, so batch_stats comes back empty;
    fire2_3/fire4_5/fire6_9 are Sequentials whose index 0 is a MaxPool.
    """
    if arch == "squeezeseg_v1":
        return _convert_squeezeseg_v1_state(state_dict)
    assert arch == "squeezeseg_v2", arch
    params: Dict = {}
    stats: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return _to_np(state_dict[key])

    def conv_relu_norm(t_prefix, mine):
        _set(params, (*mine, "conv", "weight"), take(f"{t_prefix}.0.weight"))
        _set(params, (*mine, "conv", "bias"), take(f"{t_prefix}.0.bias"))
        _set(params, (*mine, "bn", "weight"), take(f"{t_prefix}.2.weight"))
        _set(params, (*mine, "bn", "bias"), take(f"{t_prefix}.2.bias"))
        _set(stats, (*mine, "bn", "running_mean"), take(f"{t_prefix}.2.running_mean"))
        _set(stats, (*mine, "bn", "running_var"), take(f"{t_prefix}.2.running_var"))
        consumed.add(f"{t_prefix}.2.num_batches_tracked")

    def cam(t_prefix, mine):
        _set(params, (mine, "fc1", "weight"), take(f"{t_prefix}.attn.1.weight"))
        _set(params, (mine, "fc1", "bias"), take(f"{t_prefix}.attn.1.bias"))
        _set(params, (mine, "fc2", "weight"), take(f"{t_prefix}.attn.3.weight"))
        _set(params, (mine, "fc2", "bias"), take(f"{t_prefix}.attn.3.bias"))

    def fire(t_prefix, mine, up=False):
        conv_relu_norm(f"{t_prefix}.squeeze1x1", (mine, "squeeze1x1"))
        conv_relu_norm(f"{t_prefix}.expand1x1", (mine, "expand1x1"))
        conv_relu_norm(f"{t_prefix}.expand3x3", (mine, "expand3x3"))
        if up:
            _set(params, (mine, "upsample", "weight"),
                 take(f"{t_prefix}.upsample.0.weight"))
            _set(params, (mine, "upsample", "bias"),
                 take(f"{t_prefix}.upsample.0.bias"))

    conv_relu_norm("encoder.conv_1a.0", ("conv1a",))
    cam("encoder.conv_1a.1", "cam1")
    conv_relu_norm("encoder.conv_1b", ("conv1b",))
    fire("encoder.fire_2_3.1", "fire2")
    cam("encoder.fire_2_3.2", "cam2")
    fire("encoder.fire_2_3.3", "fire3")
    cam("encoder.fire_2_3.4", "cam3")
    fire("encoder.fire_4_5.1", "fire4")
    fire("encoder.fire_4_5.2", "fire5")
    for i, name in ((1, "fire6"), (2, "fire7"), (3, "fire8"), (4, "fire9")):
        fire(f"encoder.fire_6_9.{i}", name)
    for i, name in ((10, "fire10"), (11, "fire11"), (12, "fire12"), (13, "fire13")):
        fire(f"decoder.fire_{i}", name, up=True)
    _set(params, ("head", "weight"), take("decoder.head.1.weight"))
    _set(params, ("head", "bias"), take("decoder.head.1.bias"))

    if "crf.weight_appearance" in state_dict:
        _set(params, ("crf", "weight_appearance"), take("crf.weight_appearance"))
        _set(params, ("crf", "weight_smoothness"), take("crf.weight_smoothness"))
        _set(params, ("crf", "label_compatibility"),
             take("crf.label_compatibility.weight"))

    leftovers = [
        k for k in state_dict
        if k not in consumed and "num_batches_tracked" not in k
        and not any(t in k for t in ("theta_", "kernel_gamma", "kernel_alpha"))
    ]
    if leftovers:
        raise KeyError(f"unconverted squeezeseg keys: {leftovers}")
    return params, stats


def _convert_squeezeseg_v1_state(state_dict: Dict[str, Any]):
    """SqueezeSegV1 (reference squeezeseg_v1.py:27-113) -> (params, {}).

    ConvReLU = Sequential(conv, relu) so conv weights live at index 0; the upsample
    DeconvReLU ConvTranspose at `.upsample.0`; Head = Sequential(dropout, conv) so
    the head conv is index 1. No BatchNorm anywhere in V1.
    """
    params: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return _to_np(state_dict[key])

    def conv_relu(t_prefix, mine):
        _set(params, (*mine, "conv", "weight"), take(f"{t_prefix}.0.weight"))
        _set(params, (*mine, "conv", "bias"), take(f"{t_prefix}.0.bias"))

    def fire(t_prefix, mine, up=False):
        conv_relu(f"{t_prefix}.squeeze1x1", (mine, "squeeze1x1"))
        conv_relu(f"{t_prefix}.expand1x1", (mine, "expand1x1"))
        conv_relu(f"{t_prefix}.expand3x3", (mine, "expand3x3"))
        if up:
            _set(params, (mine, "upsample", "weight"),
                 take(f"{t_prefix}.upsample.0.weight"))
            _set(params, (mine, "upsample", "bias"),
                 take(f"{t_prefix}.upsample.0.bias"))

    conv_relu("conv1a", ("conv1a",))
    conv_relu("conv1b", ("conv1b",))
    fire("fire2_3.1", "fire2")
    fire("fire2_3.2", "fire3")
    fire("fire4_5.1", "fire4")
    fire("fire4_5.2", "fire5")
    for i, name in ((1, "fire6"), (2, "fire7"), (3, "fire8"), (4, "fire9")):
        fire(f"fire6_9.{i}", name)
    for name in ("fire10", "fire11", "fire12", "fire13"):
        fire(name, name, up=True)
    _set(params, ("head", "weight"), take("head.1.weight"))
    _set(params, ("head", "bias"), take("head.1.bias"))

    if "crf.weight_appearance" in state_dict:
        _set(params, ("crf", "weight_appearance"), take("crf.weight_appearance"))
        _set(params, ("crf", "weight_smoothness"), take("crf.weight_smoothness"))
        _set(params, ("crf", "label_compatibility"),
             take("crf.label_compatibility.weight"))

    leftovers = [
        k for k in state_dict
        if k not in consumed
        and not any(t in k for t in ("theta_", "kernel_gamma", "kernel_alpha"))
    ]
    if leftovers:
        raise KeyError(f"unconverted squeezeseg_v1 keys: {leftovers}")
    return params, {}


def load_reference_checkpoint(path: str):
    """Load a released `.pth` (torch) checkpoint -> dict with converted variables.

    Returns {"cfg": dict, "angle": np.ndarray, "G": vars, "G_ema": vars, "D": params}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    cfg = ckpt["cfg"]
    if hasattr(cfg, "to_container"):  # OmegaConf saved object
        from omegaconf import OmegaConf  # pragma: no cover

        cfg = OmegaConf.to_container(cfg)
    arch = cfg["model"]["generator"]["arch"] if isinstance(cfg, dict) else cfg.model.generator.arch

    out = {"cfg": cfg, "angle": _to_np(ckpt["angle"]) if "angle" in ckpt else None}
    for key in ("G", "G_ema"):
        if key in ckpt:
            p, s, c = convert_generator_state(ckpt[key], arch)
            out[key] = {"params": p, "stats": s, "consts": c}
    if "D" in ckpt:
        d_arch = (
            cfg["model"]["discriminator"]["arch"]
            if isinstance(cfg, dict)
            else cfg.model.discriminator.arch
        )
        out["D"] = {"params": convert_discriminator_state(ckpt["D"], d_arch)}
    return out
