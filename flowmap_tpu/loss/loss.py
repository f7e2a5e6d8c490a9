"""Reprojection losses: flow consistency and point-track consistency.

Parity: `flowmap/loss/loss_flow.py`, `flowmap/loss/loss_tracking.py`,
`flowmap/loss/loss.py` in the reference. Pure functions of
(model_output, flows, tracks, step); the `enable_after` gate is a traced
multiplier (`step >= enable_after`) so a single jitted step covers the whole
schedule without retracing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float, Int

from ..ops.geometry import (
    compute_backward_flow,
    compute_forward_flow,
    sample_image_grid,
)
from ..ops.surface import compute_track_flow, compute_track_flow_packed
from ..types import Flows, ModelOutput, Tracks, TracksPacked
from .mapping import MappingCfg, apply_mapping


@dataclass(frozen=True)
class LossFlowCfg:
    name: Literal["flow"] = "flow"
    enable_after: int = 0
    weight: float = 1000.0
    mapping: MappingCfg = field(default_factory=MappingCfg)


@dataclass(frozen=True)
class LossTrackingCfg:
    name: Literal["tracking"] = "tracking"
    enable_after: int = 50
    weight: float = 100.0
    mapping: MappingCfg = field(default_factory=MappingCfg)


LossCfg = LossFlowCfg | LossTrackingCfg


def loss_flow(
    cfg: LossFlowCfg,
    flows: Flows,
    model_output: ModelOutput,
    image_shape: tuple[int, int],
) -> Float[Array, ""]:
    """Induced forward+backward flow vs observed flow, robustly mapped and
    masked by photometric-consistency weights (`loss_flow.py:31-70`)."""
    h, w = image_shape
    xy, _ = sample_image_grid((h, w), dtype=model_output.surfaces.dtype)

    xy_fwd = compute_forward_flow(
        model_output.surfaces, model_output.extrinsics, model_output.intrinsics
    )
    fwd = apply_mapping(cfg.mapping, xy_fwd - xy, flows.forward, (h, w))
    loss_sum = jnp.sum(fwd * flows.forward_mask)
    valid_sum = jnp.sum(flows.forward_mask)

    xy_bwd = compute_backward_flow(
        model_output.surfaces, model_output.extrinsics, model_output.intrinsics
    )
    bwd = apply_mapping(cfg.mapping, xy_bwd - xy, flows.backward, (h, w))
    loss_sum = loss_sum + jnp.sum(bwd * flows.backward_mask)
    valid_sum = valid_sum + jnp.sum(flows.backward_mask)

    return loss_sum / jnp.maximum(valid_sum, 1.0)


def loss_tracking(
    cfg: LossTrackingCfg,
    tracks: Sequence[Tracks] | TracksPacked,
    model_output: ModelOutput,
    image_shape: tuple[int, int],
) -> Float[Array, ""]:
    """Per track segment: all-pairs source->target reprojection error vs the
    tracked locations, masked by joint visibility (`loss_tracking.py:28-61`).

    Accepts either a ragged segment list (reference semantics, one subgraph
    per segment) or a `TracksPacked` (uniform windows, one vmapped subgraph —
    numerically identical, much cheaper to compile and run)."""
    h, w = image_shape
    if isinstance(tracks, TracksPacked):
        xy_target, visibility = compute_track_flow_packed(
            model_output.surfaces,
            model_output.extrinsics,
            model_output.intrinsics,
            tracks,
        )
        xy_target_gt = tracks.xy[:, :, None]  # b s 1 ft p 2
        mapped = apply_mapping(cfg.mapping, xy_target, xy_target_gt, (h, w))
        loss_sum = jnp.sum(mapped * visibility)
        valid_sum = jnp.sum(visibility)
        return loss_sum / jnp.maximum(valid_sum, 1.0)
    loss_sum = jnp.zeros((), dtype=model_output.surfaces.dtype)
    valid_sum = jnp.zeros((), dtype=model_output.surfaces.dtype)
    for segment in tracks:
        f = segment.xy.shape[1]
        s = segment.start_frame
        xy_target, visibility = compute_track_flow(
            model_output.surfaces[:, s : s + f],
            model_output.extrinsics[:, s : s + f],
            model_output.intrinsics[:, s : s + f],
            segment,
        )
        xy_target_gt = segment.xy[:, None]  # b 1 ft p 2
        mapped = apply_mapping(cfg.mapping, xy_target, xy_target_gt, (h, w))
        loss_sum = loss_sum + jnp.sum(mapped * visibility)
        valid_sum = valid_sum + jnp.sum(visibility)
    return loss_sum / jnp.maximum(valid_sum, 1.0)


def compute_losses(
    cfgs: Sequence[LossCfg],
    flows: Flows,
    tracks: Optional[Sequence[Tracks]],
    model_output: ModelOutput,
    global_step: Int[Array, ""] | int,
    image_shape: tuple[int, int],
) -> tuple[Float[Array, ""], dict[str, Float[Array, ""]]]:
    """Weighted, gated sum of all enabled losses (`loss.py:31-47`)."""
    total = jnp.zeros((), dtype=jnp.float32)
    individual: dict[str, Float[Array, ""]] = {}
    step = jnp.asarray(global_step)
    for cfg in cfgs:
        if isinstance(cfg, LossFlowCfg):
            value = loss_flow(cfg, flows, model_output, image_shape)
        elif isinstance(cfg, LossTrackingCfg):
            if tracks is None:
                raise ValueError("tracking loss requires tracks")
            if not isinstance(tracks, TracksPacked) and len(tracks) == 0:
                continue
            value = loss_tracking(cfg, tracks, model_output, image_shape)
        else:
            raise ValueError(f"unknown loss cfg: {cfg}")
        gate = (step >= cfg.enable_after).astype(value.dtype)
        weighted = cfg.weight * gate * value
        individual[cfg.name] = weighted
        total = total + weighted
    return total, individual
