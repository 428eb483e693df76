"""Hydra-style YAML config composition (dependency-free).

The reference composes ``bubbleformer/config/default.yaml``'s ``defaults``
list over four groups (data_cfg / model_cfg / optim_cfg / scheduler_cfg) with
CLI dot-list overrides (``python scripts/train.py nodes=1 devices=4
batch_size=8 data_cfg=poolboiling_saturated``).  This module reimplements
exactly that composition on plain PyYAML: group swaps (``group=name``) and
value overrides (``a.b.c=value``, values parsed as YAML) — no hydra
dependency.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml

GROUPS = ("data_cfg", "model_cfg", "optim_cfg", "scheduler_cfg", "mesh_cfg")

DEFAULT_CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def _set_dotted(cfg: Dict[str, Any], key: str, value: Any) -> None:
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_config(
    overrides: Optional[List[str]] = None,
    config_dir: str = DEFAULT_CONFIG_DIR,
    config_name: str = "default",
) -> Dict[str, Any]:
    """Compose the run config: defaults -> group files -> CLI overrides."""
    overrides = list(overrides or [])
    root = _load_yaml(os.path.join(config_dir, f"{config_name}.yaml"))
    defaults = root.pop("defaults", [])

    # Group selections from defaults list; "_self_" keeps root keys.
    selections: Dict[str, str] = {}
    for entry in defaults:
        if entry == "_self_":
            continue
        if isinstance(entry, dict):
            for group, name in entry.items():
                selections[group] = name

    # Group swaps from the CLI take precedence over the defaults list.
    value_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} must be key=value")
        key, _, raw = ov.partition("=")
        if key in GROUPS:
            selections[key] = raw
        else:
            value_overrides.append((key, yaml.safe_load(raw)))

    cfg = dict(root)
    for group, name in selections.items():
        cfg[group] = _load_yaml(os.path.join(config_dir, group, f"{name}.yaml"))

    for key, value in value_overrides:
        _set_dotted(cfg, key, value)

    return _expand_env(cfg)


def _expand_env(node: Any) -> Any:
    """Expand ``${VAR}`` in string leaves (e.g. ``${BUBBLEML_DIR}`` in paths)."""
    if isinstance(node, dict):
        return {k: _expand_env(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_expand_env(v) for v in node]
    if isinstance(node, str):
        return os.path.expandvars(node)
    return node
