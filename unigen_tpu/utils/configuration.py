"""Config system: YAML + dotted-key CLI overrides, no OmegaConf dependency.

Mirrors the reference's initialize_config/flatten_config (reference:
utils/configuration.py:9-45) including ``${a.b.c}`` interpolation
(used e.g. at configs/unigen_1_5b/unigen_pt1.yaml:81).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access and a .get that descends into nested Configs."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def _set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, Config())
    node[keys[-1]] = value


def _get_dotted(cfg: Dict, dotted: str) -> Any:
    node = cfg
    for k in dotted.split("."):
        node = node[k]
    return node


_INTERP = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")


def _resolve_interpolations(node: Any, root: Dict) -> Any:
    if isinstance(node, dict):
        return Config({k: _resolve_interpolations(v, root) for k, v in node.items()})
    if isinstance(node, list):
        return [_resolve_interpolations(v, root) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:
            return _resolve_interpolations(_get_dotted(root, m.group(1)), root)
    return node


def initialize_config(yaml_path: Optional[str] = None,
                      overrides: Optional[List[str]] = None) -> Config:
    """Load YAML and merge ``key.path=value`` CLI overrides
    (reference: utils/configuration.py:9-14)."""
    cfg: Dict = {}
    if yaml_path:
        with open(yaml_path) as f:
            cfg = yaml.safe_load(f) or {}
    cfg = Config.wrap(cfg)
    for ov in overrides or []:
        if "=" not in ov:
            continue
        key, _, val = ov.partition("=")
        if key == "config":
            continue
        _set_dotted(cfg, key, _parse_value(val))
    return Config.wrap(_resolve_interpolations(cfg, cfg))


def flatten_config(cfg: Dict, prefix: str = "") -> Dict[str, Any]:
    """Nested config -> flat dotted dict, for metric loggers
    (reference: utils/configuration.py:17-45)."""
    flat: Dict[str, Any] = {}
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_config(v, key))
        else:
            flat[key] = v
    return flat
