"""String-dispatch model builders (reference gans/models/builder.py:1-32)."""

from __future__ import annotations

from typing import Any, Dict

from . import dusty_v1, dusty_v2, vanilla

__all__ = ["build_generator", "build_discriminator"]


def _normalize_out_ch(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    kwargs = dict(kwargs)
    if "out_ch" in kwargs:
        kwargs["out_ch"] = tuple(dict(o) for o in kwargs["out_ch"])
    if "resolution" in kwargs:
        kwargs["resolution"] = tuple(kwargs["resolution"])
    if "layers" in kwargs:
        kwargs["layers"] = tuple(kwargs["layers"])
    if "pe_scale_offset" in kwargs:
        kwargs["pe_scale_offset"] = tuple(kwargs["pe_scale_offset"])
    return kwargs


def build_generator(cfg: Dict[str, Any]):
    """cfg: {"arch": ..., "mapping_kwargs": ..., "synthesis_kwargs": ...,
    "measurement_kwargs": ...} (same schema as the reference configs)."""
    arch = cfg["arch"]
    if arch == "vanilla":
        return vanilla.Generator(
            synthesis_kwargs=_normalize_out_ch(cfg["synthesis_kwargs"])
        )
    if arch == "dusty_v1":
        return dusty_v1.Generator(
            synthesis_kwargs=_normalize_out_ch(cfg["synthesis_kwargs"]),
            measurement_kwargs=dict(cfg.get("measurement_kwargs", {})),
        )
    if arch == "dusty_v2":
        return dusty_v2.Generator(
            mapping_kwargs=dict(cfg["mapping_kwargs"]),
            synthesis_kwargs=_normalize_out_ch(cfg["synthesis_kwargs"]),
            measurement_kwargs=dict(cfg.get("measurement_kwargs", {})),
            compute_dtype=cfg.get("compute_dtype", "float32"),
        )
    raise NotImplementedError(f"generator arch: {arch}")


def build_discriminator(cfg: Dict[str, Any]):
    arch = cfg["arch"]
    kwargs = _normalize_out_ch(cfg["layer_kwargs"])
    if arch == "vanilla":
        return vanilla.Discriminator(**kwargs)
    if arch == "dusty_v2":
        kwargs.setdefault("compute_dtype", cfg.get("compute_dtype", "float32"))
        return dusty_v2.Discriminator(**kwargs)
    raise NotImplementedError(f"discriminator arch: {arch}")
