"""Minimal hydra-style component instantiation from YAML configs.

The reference swaps components (model / reward model / dataset / collator)
via `_target_` YAMLs instantiated with hydra
(reference: main_diff_rloo_trainer.py:28-43, configs/{models,datasets}/*).
hydra isn't a dependency here; this ~60-line resolver covers the subset the
config tree uses: dotted `_target_` import, nested dict instantiation,
`_partial_: true` for collator functions, and call-time overrides.
"""

from __future__ import annotations

import functools
import importlib
from typing import Any

import yaml


def load_yaml(path: str) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def _resolve(target: str):
    module, _, attr = target.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def instantiate(cfg: Any, **overrides) -> Any:
    """Recursively instantiate `_target_` nodes; other values pass through."""
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    if not isinstance(cfg, dict):
        return cfg
    cfg = dict(cfg)
    target = cfg.pop("_target_", None)
    partial = cfg.pop("_partial_", False)
    kwargs = {k: instantiate(v) for k, v in cfg.items()}
    kwargs.update(overrides)
    if target is None:
        return kwargs
    fn = _resolve(target)
    if partial:
        return functools.partial(fn, **kwargs)
    return fn(**kwargs)


def instantiate_file(path: str, **overrides) -> Any:
    return instantiate(load_yaml(path), **overrides)
