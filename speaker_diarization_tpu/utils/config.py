"""Typed configuration: YAML ↔ dataclasses, one system for every family.

Replaces the reference's four config mechanisms (yamlargparse / argparse
dataclasses / TOML / hyperpyyaml — SURVEY.md §5) with plain dataclasses
loaded from YAML plus dotted-path CLI overrides (`--set a.b=c`). No
cluster-specific absolute-path defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type, TypeVar, get_type_hints

import yaml

T = TypeVar("T")


def _coerce(value: Any, typ: Any) -> Any:
    if typ in (int, float, str, bool):
        if typ is bool and isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return typ(value)
    if typ is tuple or getattr(typ, "__origin__", None) is tuple:
        return tuple(value)
    return value


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build a (possibly nested) dataclass from a dict; unknown keys error."""
    hints = get_type_hints(cls)
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in (data or {}).items():
        if k not in fields:
            raise KeyError(f"unknown config key '{k}' for {cls.__name__}; valid: {sorted(fields)}")
        typ = hints.get(k, Any)
        if dataclasses.is_dataclass(typ) and isinstance(v, dict):
            kwargs[k] = from_dict(typ, v)
        else:
            kwargs[k] = _coerce(v, typ)
    return cls(**kwargs)


def load_yaml(cls: Type[T], path: str) -> T:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return from_dict(cls, data)


def to_dict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


def apply_overrides(obj: T, overrides: list[str]) -> T:
    """Apply 'a.b=value' overrides to a (frozen or mutable) dataclass tree."""
    data = to_dict(obj)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, val = ov.split("=", 1)
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        old = node.get(parts[-1])
        node[parts[-1]] = yaml.safe_load(val) if not isinstance(old, str) else val
    return from_dict(type(obj), data)
