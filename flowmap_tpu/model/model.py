"""Model composition: backbone -> intrinsics -> unproject -> extrinsics.

Parity: `flowmap/model/model.py:41-110`. The model is a pure function of
(params, state, batch, flows, step, key); everything downstream of the
backbone is raw geometry, so a single jit of `forward` covers the full
differentiable pipeline from pixels to poses.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.geometry import sample_image_grid, unproject
from ..types import Batch, Flows, ModelExports, ModelOutput
from .backbone import BackboneCfg, apply_backbone, init_backbone
from .extrinsics import ExtrinsicsCfg, apply_extrinsics, init_extrinsics
from .intrinsics import (
    IntrinsicsCfg,
    IntrinsicsState,
    apply_intrinsics,
    init_intrinsics,
    init_intrinsics_state,
)


@dataclass(frozen=True)
class ModelCfg:
    backbone: BackboneCfg
    intrinsics: IntrinsicsCfg
    extrinsics: ExtrinsicsCfg
    use_correspondence_weights: bool = True


@struct.dataclass
class ModelState:
    """Non-parameter functional state carried across steps."""

    intrinsics: IntrinsicsState


def init_model(
    cfg: ModelCfg,
    key: jax.Array,
    num_frames: Optional[int] = None,
    image_shape: Optional[tuple[int, int]] = None,
) -> tuple[dict, ModelState]:
    k_backbone, _ = jax.random.split(key)
    params = {
        "backbone": init_backbone(cfg.backbone, num_frames, image_shape, k_backbone),
        "intrinsics": init_intrinsics(cfg.intrinsics),
        "extrinsics": init_extrinsics(cfg.extrinsics, num_frames),
    }
    state = ModelState(intrinsics=init_intrinsics_state(cfg.intrinsics))
    return params, state


def forward(
    cfg: ModelCfg,
    params: dict,
    state: ModelState,
    batch: Batch,
    flows: Flows,
    global_step,
    key: jax.Array,
    train: bool = True,
) -> tuple[ModelOutput, ModelState]:
    _, _, _, h, w = batch.videos.shape
    k_intrinsics, k_extrinsics = jax.random.split(key)

    backbone_out = apply_backbone(cfg.backbone, params["backbone"], batch, flows)

    # Ablation: ignore learned correspondence weights (model.py:67-68).
    if not cfg.use_correspondence_weights:
        backbone_out = backbone_out.replace(
            weights=jnp.ones_like(backbone_out.weights)
        )

    intrinsics, new_intrinsics_state = apply_intrinsics(
        cfg.intrinsics,
        params["intrinsics"],
        state.intrinsics,
        batch,
        flows,
        backbone_out,
        jnp.asarray(global_step),
        k_intrinsics,
        train=train,
    )

    xy, _ = sample_image_grid((h, w), dtype=batch.videos.dtype)
    surfaces = unproject(
        xy, backbone_out.depths, intrinsics[:, :, None, None]
    )

    extrinsics = apply_extrinsics(
        cfg.extrinsics,
        params["extrinsics"],
        batch,
        flows,
        backbone_out,
        surfaces,
        k_extrinsics,
    )

    output = ModelOutput(
        depths=backbone_out.depths,
        surfaces=surfaces,
        intrinsics=intrinsics,
        extrinsics=extrinsics,
        backward_correspondence_weights=backbone_out.weights,
    )
    return output, state.replace(intrinsics=new_intrinsics_state)


def export(
    cfg: ModelCfg,
    params: dict,
    state: ModelState,
    batch: Batch,
    flows: Flows,
    global_step,
    key: jax.Array,
) -> ModelExports:
    """Final outputs for COLMAP export (model.py:92-110); batch size 1."""
    assert batch.videos.shape[0] == 1
    output, _ = forward(
        cfg, params, state, batch, flows, global_step, key, train=False
    )
    return ModelExports(
        extrinsics=output.extrinsics,
        intrinsics=output.intrinsics,
        colors=batch.videos,
        depths=output.depths,
    )
