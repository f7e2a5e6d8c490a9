"""Explicit per-pixel depth backbone (no neural network).

Parity: `flowmap/model/backbone/backbone_explicit_depth.py:19-44`. Depth is a
raw (f, h, w) parameter grid; correspondence weights are the sigmoid of a
(f-1, h, w) parameter grid scaled by `weight_sensitivity`. This enables the
full pipeline end-to-end with zero pretrained weights (the reference's
`+experiment=ablation_explicit_depth`) and is the round-1 minimum slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp

from ...types import Batch, BackboneOutput, Flows


@dataclass(frozen=True)
class BackboneExplicitDepthCfg:
    name: Literal["explicit_depth"] = "explicit_depth"
    initial_depth: float = 0.1
    weight_sensitivity: float = 100.0


def init_explicit_depth(
    cfg: BackboneExplicitDepthCfg,
    num_frames: int,
    image_shape: tuple[int, int],
) -> dict:
    h, w = image_shape
    return {
        "depth": jnp.full((num_frames, h, w), cfg.initial_depth, dtype=jnp.float32),
        "weights": jnp.zeros((num_frames - 1, h, w), dtype=jnp.float32),
    }


def apply_explicit_depth(
    cfg: BackboneExplicitDepthCfg,
    params: dict,
    batch: Batch,
    flows: Flows,
) -> BackboneOutput:
    b = batch.videos.shape[0]
    assert b == 1, "explicit depth only supports batch size 1"
    return BackboneOutput(
        depths=params["depth"][None],
        weights=jax.nn.sigmoid(cfg.weight_sensitivity * params["weights"])[None],
    )
