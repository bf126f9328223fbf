"""One coherent config system: YAML + ``_base_`` inheritance + dotted
CLI overrides + a dataset catalog.

The reference carries three overlapping mechanisms — argparse flags
(``parser.py``), YAML/EasyDict with ``_base_`` (duplicated at
``utils/utils.py:19-47``, ``data/dataset_3d.py:822-847``,
``utils/config.py:26-52``), and mmcv-style registries resolved through an
absolute-path ``dataset_catalog.json``. This module replaces all of them:

  - :func:`load_config` — YAML -> nested dict, recursive ``_base_``
    includes resolved relative to the including file (fixing the
    absolute-path catalog wart);
  - :func:`apply_overrides` — ``a.b.c=value`` dotted assignments with
    YAML-typed values (the openpoints ``EasyConfig.update`` behavior);
  - :func:`config_to_args` — projects a config onto a ``TaskArgs``;
  - the dataset catalog is just ``configs/datasets/<name>.yaml`` files.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List

import yaml

CONFIG_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs",
)


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for key, value in override.items():
        if (
            key in out
            and isinstance(out[key], dict)
            and isinstance(value, dict)
        ):
            out[key] = _merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def load_config(path: str) -> Dict[str, Any]:
    """YAML -> dict with recursive ``_base_`` inheritance (paths relative
    to the including file)."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_spec = cfg.pop("_base_", None)
    if base_spec is None:
        return cfg
    bases: List[str] = base_spec if isinstance(base_spec, list) else [base_spec]
    merged: Dict[str, Any] = {}
    for base in bases:
        base_path = base
        if not os.path.isabs(base_path):
            base_path = os.path.join(os.path.dirname(path), base)
        merged = _merge(merged, load_config(base_path))
    return _merge(merged, cfg)


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``key.path=value`` strings; values parse as YAML scalars."""
    out = copy.deepcopy(cfg)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        key, raw = item.split("=", 1)
        value = yaml.safe_load(raw)
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def dataset_config(name: str) -> Dict[str, Any]:
    """The catalog: ``configs/datasets/<name>.yaml``."""
    path = os.path.join(CONFIG_ROOT, "datasets", f"{name}.yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no dataset config {path}")
    return load_config(path)


def config_to_args(cfg: Dict[str, Any], args=None):
    """Project a flat(ish) config dict onto TaskArgs fields."""
    from ppt_tpu.tasks.args import TaskArgs

    if args is None:
        args = TaskArgs()
    for key, value in cfg.items():
        if isinstance(value, dict):
            config_to_args(value, args)
        elif hasattr(args, key):
            setattr(args, key, value)
    return args
