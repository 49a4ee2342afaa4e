"""Config system: yaml recipes with `${...}` interpolation, dotted CLI overrides, and
`_target_` instantiation - a light, first-party replacement for the reference's
hydra/OmegaConf stack (reference train.py:14,26-103; SURVEY.md #5 'Config / flag system').

Reference `_target_` strings are accepted verbatim and re-pointed to our modules via
TARGET_REGISTRY, so the reference's own recipe yamls drive this framework unchanged.
Supports `defaults: [<base>]`-style single-file inheritance for our layered configs.
"""

import copy
import importlib
import os
import re
from typing import Any, Callable, Dict, List, Optional

import yaml

# reference target -> our implementation
TARGET_REGISTRY: Dict[str, str] = {
    "micro_diffusion.models.model.create_latent_diffusion":
        "micro_diffusion_tpu.models.diffusion.create_latent_diffusion",
    "micro_diffusion.datasets.latents_loader.build_streaming_latents_dataloader":
        "micro_diffusion_tpu.datasets.latents_loader.build_streaming_latents_dataloader",
    "micro_diffusion.models.callbacks.LogDiffusionImages":
        "micro_diffusion_tpu.train.callbacks.LogDiffusionImages",
    "micro_diffusion.models.callbacks.NaNCatcher":
        "micro_diffusion_tpu.train.callbacks.NaNCatcher",
    "composer.callbacks.speed_monitor.SpeedMonitor":
        "micro_diffusion_tpu.train.callbacks.SpeedMonitor",
    "composer.callbacks.lr_monitor.LRMonitor":
        "micro_diffusion_tpu.train.callbacks.LRMonitor",
    "composer.callbacks.runtime_estimator.RuntimeEstimator":
        "micro_diffusion_tpu.train.callbacks.RuntimeEstimator",
    "composer.callbacks.OptimizerMonitor":
        "micro_diffusion_tpu.train.callbacks.OptimizerMonitor",
    "composer.loggers.TensorboardLogger":
        "micro_diffusion_tpu.train.callbacks.TensorboardLogger",
    "composer.loggers.wandb_logger.WandBLogger":
        "micro_diffusion_tpu.train.callbacks.TensorboardLogger",  # wandb not available
}

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _resolve_path(cfg: dict, dotted: str) -> Any:
    node: Any = cfg
    for part in dotted.split("."):
        node = node[part]
    return node


def resolve_interpolations(cfg: dict) -> dict:
    """Resolve ${dotted.path} interpolations against the config root."""

    def resolve(node: Any) -> Any:
        if isinstance(node, dict):
            return {k: resolve(v) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v) for v in node]
        if isinstance(node, str):
            m = _INTERP.fullmatch(node)
            if m:
                return _resolve_path(cfg, m.group(1))
            return _INTERP.sub(
                lambda mm: str(_resolve_path(cfg, mm.group(1))), node
            )
        return node

    return resolve(cfg)


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def apply_overrides(cfg: dict, overrides: List[str]) -> dict:
    """Apply hydra-style dotted CLI overrides: a.b.c=value."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        assert "=" in ov, f"override must be key=value, got {ov}"
        key, raw = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return cfg


def _deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(
    config_path: str,
    config_name: str,
    overrides: Optional[List[str]] = None,
    _resolve: bool = True,
) -> dict:
    """Load a recipe yaml (+ its `defaults` bases), apply overrides, resolve
    interpolations.

    Interpolations resolve only at the TOP-level call (after the full defaults
    merge): a base file may reference keys its children define (e.g. base.yaml's
    ``${exp_name}``, defined per stage) - hydra semantics. A base's own path can
    cross directories ("../res_256_pretrain" from an overlay dir); its further
    defaults resolve relative to ITS directory.
    """
    if not config_name.endswith((".yaml", ".yml")):
        config_name += ".yaml"
    path = os.path.join(config_path, config_name)
    with open(path) as f:
        cfg = yaml.safe_load(f)

    bases = cfg.pop("defaults", [])
    merged: dict = {}
    for base in bases if isinstance(bases, list) else [bases]:
        base_cfg = load_config(
            os.path.dirname(path), str(base), _resolve=False
        )
        merged = _deep_merge(merged, base_cfg)
    cfg = _deep_merge(merged, cfg)

    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return resolve_interpolations(cfg) if _resolve else cfg


def resolve_target(target: str) -> Callable:
    target = TARGET_REGISTRY.get(target, target)
    module, _, name = target.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate(block: dict, **extra: Any) -> Any:
    """hydra.utils.instantiate equivalent: call block['_target_'] with the remaining
    keys (+ extra kwargs)."""
    assert "_target_" in block, block
    kwargs = {k: v for k, v in block.items() if k != "_target_"}
    kwargs.update(extra)
    return resolve_target(block["_target_"])(**kwargs)
