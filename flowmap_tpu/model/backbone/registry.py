"""Backbone registry: cfg-discriminated dispatch (reference:
`flowmap/model/backbone/__init__.py:13-18`)."""

from __future__ import annotations

from typing import Optional

import jax

from ...types import Batch, BackboneOutput, Flows
from .backbone_explicit_depth import (
    BackboneExplicitDepthCfg,
    apply_explicit_depth,
    init_explicit_depth,
)
from .backbone_midas import BackboneMidasCfg

BackboneCfg = BackboneExplicitDepthCfg | BackboneMidasCfg


def init_backbone(
    cfg: BackboneCfg,
    num_frames: Optional[int],
    image_shape: Optional[tuple[int, int]],
    key: jax.Array,
) -> dict:
    if isinstance(cfg, BackboneExplicitDepthCfg):
        assert num_frames is not None and image_shape is not None
        return init_explicit_depth(cfg, num_frames, image_shape)
    if isinstance(cfg, BackboneMidasCfg):
        from .backbone_midas import init_midas

        return init_midas(cfg, num_frames, image_shape, key)
    raise ValueError(f"unknown backbone cfg: {cfg}")


def apply_backbone(
    cfg: BackboneCfg,
    params: dict,
    batch: Batch,
    flows: Flows,
) -> BackboneOutput:
    if isinstance(cfg, BackboneExplicitDepthCfg):
        return apply_explicit_depth(cfg, params, batch, flows)
    if isinstance(cfg, BackboneMidasCfg):
        from .backbone_midas import apply_midas

        return apply_midas(cfg, params, batch, flows)
    raise ValueError(f"unknown backbone cfg: {cfg}")
