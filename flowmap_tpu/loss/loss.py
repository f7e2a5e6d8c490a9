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
    homogenize_points,
    rigid_inverse,
    sample_image_grid,
)
from ..ops.surface import compute_track_flow, sample_track_points_packed
from ..types import Flows, ModelOutput, Tracks, TracksPacked
from .mapping import MappingCfg, apply_mapping, apply_mapping_components


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
    from ..ops.pallas.runtime import kernels_enabled

    if (
        kernels_enabled()
        and cfg.mapping.name == "huber"
        and model_output.surfaces.shape[0] == 1
        and tuple(model_output.surfaces.shape[2:4]) == (h, w)
        and h % 8 == 0
    ):
        from ..ops.pallas.flow_loss import flow_loss_pallas

        loss_sum, valid_sum = flow_loss_pallas(
            model_output.surfaces,
            model_output.extrinsics,
            model_output.intrinsics,
            flows,
            image_shape,
            cfg.mapping.delta,
        )
        return loss_sum / jnp.maximum(valid_sum, 1.0)
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
        if _use_track_kernel(cfg, model_output, image_shape):
            from ..ops.pallas.track_loss import track_loss_pallas

            loss_sum, valid_sum = track_loss_pallas(
                model_output.surfaces,
                model_output.extrinsics,
                model_output.intrinsics,
                tracks,
                image_shape,
                cfg.mapping.delta,
            )
        else:
            loss_sum, valid_sum = _track_loss_packed_fused(
                cfg, tracks, model_output, image_shape
            )
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


def _use_track_kernel(
    cfg: LossTrackingCfg,
    model_output: ModelOutput,
    image_shape: tuple[int, int],
) -> bool:
    """The fused Pallas path covers the shipped configuration (TPU, huber
    mapping, batch 1, model-resolution surfaces); anything else falls back to
    the XLA formulation, which is fully general."""
    from ..ops.pallas.runtime import kernels_enabled

    return (
        kernels_enabled()
        and cfg.mapping.name == "huber"
        and model_output.surfaces.shape[0] == 1
        and tuple(model_output.surfaces.shape[2:4]) == tuple(image_shape)
    )


def _track_loss_packed_fused(
    cfg: LossTrackingCfg,
    tracks: TracksPacked,
    model_output: ModelOutput,
    image_shape: tuple[int, int],
) -> tuple[Float[Array, ""], Float[Array, ""]]:
    """All-pairs track reprojection loss as one batched 3x4 projection matmul.

    Numerically equivalent to `compute_track_flow_packed` + `apply_mapping`
    (up to float reassociation), but TPU-shaped: the per-pair intrinsics and
    relative transform fold into a single projection matrix
    M[s, fs, ft] = K_ft @ (E_ft^-1 @ E_fs)[:3, :], so the only large tensor
    is ONE dot_general producing (s, fs, ft, 3, p) — u/v rows plus the
    perspective denominator — laid out with the point axis last (lane
    dimension, no transpose). The divide, robust mapping, visibility masks,
    and reductions all fuse into the matmul's consumers instead of
    materializing xy_target / mapped / visibility at the 61M-point all-pairs
    size (which cost ~4x the matmul's own traffic). Reference semantics:
    `flowmap/loss/loss_tracking.py:28-61` + `flowmap/model/projection.py:255-298`.
    """
    h, w = image_shape
    surfaces = model_output.surfaces
    xyz, frame_idx = sample_track_points_packed(surfaces, tracks)  # (s, l, p, 3)
    seg_extrinsics = model_output.extrinsics[0][frame_idx]  # (s, l, 4, 4)
    seg_intrinsics = model_output.intrinsics[0][frame_idx]  # (s, l, 3, 3)

    # M[s, f, t] = K_t @ (E_t^-1 @ E_f)[:3, :] — projects homogeneous
    # source-camera points straight to (u', v', z') with u = u'/(z' + eps).
    relative = jnp.einsum(
        "stij,sfjk->sftik", rigid_inverse(seg_extrinsics), seg_extrinsics
    )
    m = jnp.einsum("stij,sftjk->sftik", seg_intrinsics, relative[..., :3, :])

    xyz_h = homogenize_points(xyz)  # (s, f, p, 4)
    uvz = jnp.einsum("sftij,sfpj->sftip", m, xyz_h)  # (s, f, t, 3, p)

    # Perspective divide (project_camera_space semantics: eps-guarded and
    # inf-clamped; the nan_to_num lands on the quotient rather than on the
    # pre-K components — identical wherever the denominator is finite).
    eps, infinity = 1e-5, 1e8
    denom = uvz[..., 2, :] + eps
    nan = lambda q: jnp.nan_to_num(q, posinf=infinity, neginf=-infinity)
    u = nan(uvz[..., 0, :] / denom)  # (s, f, t, p)
    v = nan(uvz[..., 1, :] / denom)

    gt = tracks.xy[0]  # (s, l, p, 2); GT for pair (fs, ft) is the track at ft
    gt_u = gt[:, None, :, :, 0]  # (s, 1, t, p)
    gt_v = gt[:, None, :, :, 1]

    scale = (h * w) ** 0.5
    mapped = apply_mapping_components(
        cfg.mapping, (u - gt_u) * (w / scale), (v - gt_v) * (h / scale)
    )

    visibility = tracks.visibility[0]  # (s, l, p)
    joint = visibility[:, :, None] & visibility[:, None]  # (s, f, t, p)
    xy_source = tracks.xy[0]  # (s, f, p, 2)
    source_in = (
        jnp.all(xy_source >= 0, -1) & jnp.all(xy_source < 1, -1)
    )[:, :, None]  # (s, f, 1, p)
    target_in = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    mask = (joint & source_in & target_in).astype(mapped.dtype)

    return jnp.sum(mapped * mask), jnp.sum(mask)


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
