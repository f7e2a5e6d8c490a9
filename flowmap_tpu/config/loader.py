"""YAML config composition with Hydra-style defaults and CLI overrides.

Replaces the reference's Hydra dependency with a small composition engine:

- A root YAML may declare `defaults:` — a list of `group: name` (or
  `group: [a, b]`) entries resolved against `configs/<group>/<name>.yaml` and
  merged under the group's key path (`group/sub: name` nests).
- `_self_` body keys merge on top of defaults, later wins (deep merge).
- CLI overrides: `a.b.c=value` (YAML-parsed), `+experiment=name` merges
  `configs/experiment/<name>.yaml` on top (stackable, like the reference's
  experiment packages — `README.md:68-70`).
- List-typed plugin groups (dataset/loss/visualizer) use the dict-of-named
  form and are separated into discriminated lists at typing time
  (`separate_multiple_defaults`, reference `config/tools.py:29-56`).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Type, TypeVar

import yaml

from .tools import from_dict

T = TypeVar("T")

CONFIG_ROOT = Path(__file__).resolve().parent.parent.parent / "configs"


def deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def _set_path(tree: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = tree
    for key in keys[:-1]:
        node = node.setdefault(key, {})
        if not isinstance(node, dict):
            raise ValueError(f"cannot override through non-dict at {key} in {dotted}")
    node[keys[-1]] = value


def parse_overrides(
    args: list[str],
    config_root: Path | None = None,
) -> tuple[dict, list[str], list[tuple[str, list[str]]]]:
    """Parse `key=value` overrides, `+experiment=name` selections, and
    group selections (`model/backbone=explicit_depth`, `flow=precomputed`) —
    a key naming a config group replaces that subtree with the group file."""
    config_root = Path(config_root or CONFIG_ROOT)
    overrides: dict = {}
    experiments: list[str] = []
    groups: list[tuple[str, list[str]]] = []
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override must be key=value: {arg!r}")
        key, value = arg.split("=", 1)
        if key == "+experiment":
            experiments.extend(
                v.strip() for v in value.strip("[]").split(",") if v.strip()
            )
            continue
        bare = key.lstrip("+")
        if "/" in bare or (config_root / bare).is_dir():
            names = [
                v.strip() for v in value.strip("[]").split(",") if v.strip()
            ]
            groups.append((bare, names))
            continue
        _set_path(overrides, bare, yaml.safe_load(value))
    return overrides, experiments, groups


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _resolve_defaults(
    body: dict,
    config_root: Path,
) -> dict:
    """Expand a `defaults:` list into a merged dict (reference semantics:
    each entry merges under its group key; `_self_` = the body itself)."""
    defaults = body.pop("defaults", None)
    if defaults is None:
        return body

    merged: dict = {}
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            merged = deep_merge(merged, body)
            self_merged = True
            continue
        (group, names), = entry.items()
        if not isinstance(names, list):
            names = [names]
        # `model/backbone: midas` nests under model.backbone.
        key_path = group.split("/")
        multi = len(names) > 1 or key_path[-1] in ("dataset", "loss", "visualizer")
        for name in names:
            content = _load_yaml(config_root / group / f"{name}.yaml")
            content = _resolve_defaults(content, config_root)
            node: Any = content
            if multi:
                # dict-of-named form for list-typed groups.
                node = {name: content}
            tree: dict = node
            for key in reversed(key_path):
                tree = {key: tree}
            merged = deep_merge(merged, tree)
    if not self_merged:
        merged = deep_merge(merged, body)
    return merged


def compose_config(
    root_name: str,
    cfg_type: Type[T],
    cli_args: list[str] | None = None,
    config_root: Path | None = None,
) -> T:
    """Load configs/<root_name>.yaml, apply experiments + overrides, type it."""
    from ..datasets import DatasetCfg
    from ..loss import LossCfg
    from ..visualization import VisualizerCfg

    config_root = Path(config_root or CONFIG_ROOT)
    body = _load_yaml(config_root / f"{root_name}.yaml")
    tree = _resolve_defaults(body, config_root)

    overrides, experiments, groups = parse_overrides(cli_args or [], config_root)

    # Group selections REPLACE the corresponding subtree.
    for group, names in groups:
        key_path = group.split("/")
        multi = len(names) > 1 or key_path[-1] in ("dataset", "loss", "visualizer")
        merged_group: dict = {}
        for name in names:
            content = _resolve_defaults(
                _load_yaml(config_root / group / f"{name}.yaml"), config_root
            )
            merged_group = (
                deep_merge(merged_group, {name: content}) if multi else content
            )
        node = tree
        for key in key_path[:-1]:
            node = node.setdefault(key, {})
        node[key_path[-1]] = merged_group

    for experiment in experiments:
        exp = _load_yaml(config_root / "experiment" / f"{experiment}.yaml")
        # Experiment `defaults: - override /group: name` entries REPLACE the
        # group subtree (the reference's Hydra override packages,
        # `config/experiment/*.yaml`); the body deep-merges on top.
        for entry in exp.pop("defaults", []) or []:
            if entry == "_self_":
                continue
            ((key, names),) = entry.items()
            group = key.removeprefix("override ").lstrip("/")
            if not isinstance(names, list):
                names = [names]
            key_path = group.split("/")
            multi = len(names) > 1 or key_path[-1] in (
                "dataset", "loss", "visualizer",
            )
            merged_group: dict = {}
            for name in names:
                content = _resolve_defaults(
                    _load_yaml(config_root / group / f"{name}.yaml"), config_root
                )
                merged_group = (
                    deep_merge(merged_group, {name: content}) if multi else content
                )
            node = tree
            for key_part in key_path[:-1]:
                node = node.setdefault(key_part, {})
            node[key_path[-1]] = merged_group
        tree = deep_merge(tree, exp)
    tree = deep_merge(tree, overrides)

    # Separate dict-of-named plugin groups into discriminated lists.
    for key, union_tp in (
        ("dataset", DatasetCfg),
        ("loss", LossCfg),
        ("visualizer", VisualizerCfg),
    ):
        if key in tree and isinstance(tree[key], dict):
            tree[key] = [
                {"name": name, **(cfg or {})} for name, cfg in tree[key].items()
            ]
    # Visualizers don't carry name literals in the reference; map names in.
    return from_dict(cfg_type, tree)
