"""Typed config conversion: plain dicts -> (frozen) dataclass trees.

Replaces the reference's dacite dependency (`flowmap/config/tools.py:16-56`):
nested dataclasses, `X | None`, `list[T]`, `tuple[...]`, `Path`, and
`name:`-Literal-discriminated unions (the plugin-config pattern used by every
registry in the framework).
"""

from __future__ import annotations

import dataclasses
import types
import typing
from pathlib import Path
from typing import Any, Literal, Type, TypeVar, Union, get_args, get_origin

T = TypeVar("T")


def _is_union(tp) -> bool:
    return get_origin(tp) in (Union, types.UnionType)


def _literal_name(cls) -> str | None:
    """The Literal value of a dataclass's `name` field, if present."""
    if not dataclasses.is_dataclass(cls):
        return None
    hints = typing.get_type_hints(cls)
    tp = hints.get("name")
    if tp is not None and get_origin(tp) is Literal:
        return get_args(tp)[0]
    return None


def from_dict(cls: Type[T], data: Any) -> T:
    """Convert `data` into an instance of type `cls`."""
    return _convert(cls, data, path="")


def _convert(tp, data, path: str):
    origin = get_origin(tp)

    if tp is Any:
        return data

    if _is_union(tp):
        members = get_args(tp)
        if data is None:
            if type(None) in members:
                return None
            raise ValueError(f"{path}: got None for non-optional {tp}")
        # Discriminate dataclass unions on the `name` Literal.
        named = {}
        for member in members:
            if member is type(None):
                continue
            name = _literal_name(member)
            if name is not None:
                named[name] = member
        if named and isinstance(data, dict) and "name" in data:
            member = named.get(data["name"])
            if member is None:
                raise ValueError(
                    f"{path}: unknown plugin name {data['name']!r}; "
                    f"expected one of {sorted(named)}"
                )
            return _convert(member, data, path)
        # Otherwise try members in order.
        errors = []
        for member in members:
            if member is type(None):
                continue
            try:
                return _convert(member, data, path)
            except (ValueError, TypeError) as e:
                errors.append(str(e))
        raise ValueError(f"{path}: no union member matched {tp}: {errors}")

    if origin is Literal:
        if data not in get_args(tp):
            raise ValueError(f"{path}: {data!r} not in {get_args(tp)}")
        return data

    if dataclasses.is_dataclass(tp):
        if not isinstance(data, dict):
            raise TypeError(f"{path}: expected dict for {tp}, got {type(data)}")
        hints = typing.get_type_hints(tp)
        kwargs = {}
        known = {f.name for f in dataclasses.fields(tp)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"{path}: unknown keys {sorted(unknown)} for {tp}")
        for field in dataclasses.fields(tp):
            if field.name in data:
                kwargs[field.name] = _convert(
                    hints[field.name], data[field.name], f"{path}.{field.name}"
                )
            elif (
                field.default is dataclasses.MISSING
                and field.default_factory is dataclasses.MISSING
            ):
                raise ValueError(f"{path}: missing required key {field.name!r}")
        return tp(**kwargs)

    if origin in (list, typing.List):
        (item_tp,) = get_args(tp) or (Any,)
        if not isinstance(data, (list, tuple)):
            raise TypeError(f"{path}: expected list, got {type(data)}")
        return [
            _convert(item_tp, item, f"{path}[{i}]") for i, item in enumerate(data)
        ]

    if origin in (tuple, typing.Tuple):
        args = get_args(tp)
        if not isinstance(data, (list, tuple)):
            raise TypeError(f"{path}: expected tuple, got {type(data)}")
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_convert(args[0], v, f"{path}[{i}]") for i, v in enumerate(data))
        if args and len(args) != len(data):
            raise ValueError(f"{path}: expected {len(args)}-tuple, got {len(data)}")
        if not args:
            return tuple(data)
        return tuple(
            _convert(a, v, f"{path}[{i}]") for i, (a, v) in enumerate(zip(args, data))
        )

    if origin in (dict, typing.Dict):
        k_tp, v_tp = get_args(tp) or (Any, Any)
        return {
            _convert(k_tp, k, path): _convert(v_tp, v, f"{path}.{k}")
            for k, v in data.items()
        }

    if tp is Path:
        return Path(data)

    if tp is float:
        if isinstance(data, bool) or not isinstance(data, (int, float, str)):
            raise TypeError(f"{path}: expected float, got {type(data)}")
        return float(data)

    if tp is int:
        if isinstance(data, bool) or not isinstance(data, int):
            # Permit exact floats like 50_000.0 from YAML.
            if isinstance(data, float) and data.is_integer():
                return int(data)
            raise TypeError(f"{path}: expected int, got {type(data)}")
        return int(data)

    if tp is bool:
        if not isinstance(data, bool):
            raise TypeError(f"{path}: expected bool, got {type(data)}")
        return data

    if tp is str:
        if not isinstance(data, str):
            raise TypeError(f"{path}: expected str, got {type(data)}")
        return data

    if isinstance(tp, type) and isinstance(data, tp):
        return data

    raise TypeError(f"{path}: unsupported type {tp}")


def separate_multiple_defaults(union_tp):
    """dict-of-named-cfgs -> list of discriminated cfgs.

    {"flow": {...}, "tracking": {...}} becomes
    [FlowCfg(name="flow", ...), TrackingCfg(name="tracking", ...)]
    (reference: `flowmap/config/tools.py:29-56`).
    """

    def separate(joined: dict) -> list:
        return [
            _convert(union_tp, {"name": name, **(cfg or {})}, name)
            for name, cfg in joined.items()
        ]

    return separate
