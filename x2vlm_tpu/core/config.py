"""Config system: YAML files + dotted-key overrides + attribute access.

Capability parity with the reference's ruamel-YAML dict + ``--override_cfg
"k:v;nested.k:v"`` merge (reference: utils/__init__.py:422-431) and ``AttrDict``
(utils/__init__.py:318-321), redesigned as a small, typed layer:

- ``load_config(path, overrides=...)`` reads YAML (or JSON) into a ``Config``.
- Overrides use the same ``"key:value;key2:value2"`` string syntax, but support
  arbitrarily-deep dotted keys (``images.batch_size:64``), values parsed as YAML.
- ``Config`` is a dict subclass with attribute access and ``.get`` semantics so
  model code can be written against either style.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import yaml

__all__ = ["Config", "load_config", "parse_overrides", "apply_overrides", "read_json"]


class Config(dict):
    """Dict with attribute access. Nested dicts are wrapped on access."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:  # pragma: no cover - error path
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, key: str, default: Any = None) -> Any:
        value = super().get(key, default)
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
            super().__setitem__(key, value)
        return value

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def read_json(path: str) -> Config:
    with open(path, "r") as f:
        return Config(json.load(f))


def parse_overrides(override_cfg: str) -> dict:
    """Parse ``"k:v;nested.k:v2"`` into a flat {dotted_key: parsed_value} dict.

    Values are parsed as YAML, so ``lr:1e-4`` gives a float, ``flag:true`` a
    bool, ``xs:[1,2]`` a list. Reference semantics: utils/__init__.py:422-431,
    extended to arbitrary nesting depth.
    """
    out: dict = {}
    if not override_cfg:
        return out
    for item in override_cfg.split(";"):
        item = item.strip()
        if not item:
            continue
        key, _, raw = item.partition(":")
        if not _:
            raise ValueError(f"override item {item!r} must be 'key:value'")
        value = yaml.safe_load(raw.strip())
        if isinstance(value, str):
            # YAML 1.1 misses bare scientific notation like "1e-4".
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        out[key.strip()] = value
    return out


def apply_overrides(config: Mapping, overrides: Mapping[str, Any]) -> Config:
    cfg = Config(_deepcopy(config))
    for dotted, value in overrides.items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            child = node.setdefault(p, {})
            if not isinstance(child, dict):
                raise TypeError(f"cannot override through non-dict key {p!r} in {dotted!r}")
            if not isinstance(child, Config):
                child = Config(child)
                node[p] = child
            node = child
        node[parts[-1]] = value
    return cfg


def _deepcopy(obj):
    if isinstance(obj, Mapping):
        return {k: _deepcopy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_deepcopy(v) for v in obj]
    return obj


def load_config(path: str, overrides: str | Mapping[str, Any] | None = None) -> Config:
    """Load a YAML/JSON config file and apply optional overrides."""
    with open(path, "r") as f:
        if os.path.splitext(path)[1] == ".json":
            raw = json.load(f)
        else:
            raw = yaml.safe_load(f)
    if raw is None:
        raw = {}
    if overrides is None:
        return Config(raw)
    if isinstance(overrides, str):
        overrides = parse_overrides(overrides)
    return apply_overrides(raw, overrides)
