"""Intrinsics estimation modules: ground_truth / regressed / softmin.

Parity: `flowmap/model/intrinsics/` in the reference. The hard part is the
softmin module's two-stage state machine (SURVEY.md §7.3 #3): the reference
mutates Python state (`self.window`, a `.data=` focal handoff at the stage
boundary, `intrinsics_softmin.py:74-82,133-139`). Here both stages live in one
jitted step:

- The trailing window of focal estimates is a fixed-size ring buffer carried
  in `IntrinsicsState` (functional state, updated with `where` gates).
- The stage switch is a `lax.cond` on the traced step — both branches compile
  once, no retracing.
- The focal handoff (regressed focal := window mean at the boundary step) is a
  pure parameter rewrite applied by `maybe_handoff_focal` before the forward
  pass. The regressed focal is a trainable parameter from step 0 with zero
  gradient during stage 1, which matches the reference exactly (its Adam
  moments are zero when stage 2 begins).

The softmin sweep itself — align the first two frames under each of the 60
candidate focals and score the induced flow — is a single batched Procrustes
solve over a (batch x candidate) axis: embarrassingly parallel, MXU-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jaxtyping import Array, Float

from ...ops.grid_sample import grid_sample_points

from ...ops.geometry import (
    focal_lengths_to_intrinsics,
    project_camera_space,
    sample_image_grid,
)
from ...ops.procrustes import align_rigid
from ...types import Batch, BackboneOutput, Flows


@dataclass(frozen=True)
class RegressionCfg:
    after_step: int = 1000
    window: int = 100


@dataclass(frozen=True)
class IntrinsicsGroundTruthCfg:
    name: Literal["ground_truth"] = "ground_truth"


@dataclass(frozen=True)
class IntrinsicsRegressedCfg:
    name: Literal["regressed"] = "regressed"
    initial_focal_length: float = 0.85


@dataclass(frozen=True)
class IntrinsicsSoftminCfg:
    name: Literal["softmin"] = "softmin"
    num_procrustes_points: int = 8192
    min_focal_length: float = 0.5
    max_focal_length: float = 2.0
    num_candidates: int = 60
    regression: Optional[RegressionCfg] = RegressionCfg()


IntrinsicsCfg = IntrinsicsGroundTruthCfg | IntrinsicsRegressedCfg | IntrinsicsSoftminCfg


@struct.dataclass
class IntrinsicsState:
    """Trailing window of softmin focal estimates (ring buffer)."""

    focal_window: Float[Array, " window"]


def init_intrinsics(cfg: IntrinsicsCfg) -> dict:
    if isinstance(cfg, IntrinsicsRegressedCfg):
        return {"focal_length": jnp.asarray(cfg.initial_focal_length, jnp.float32)}
    if isinstance(cfg, IntrinsicsSoftminCfg) and cfg.regression is not None:
        # Stage-2 regressed focal; value is overwritten at the boundary step.
        return {"focal_length": jnp.asarray(0.0, jnp.float32)}
    return {}


def init_intrinsics_state(cfg: IntrinsicsCfg) -> IntrinsicsState:
    window = 0
    if isinstance(cfg, IntrinsicsSoftminCfg) and cfg.regression is not None:
        window = cfg.regression.window
    return IntrinsicsState(focal_window=jnp.zeros((max(window, 1),), jnp.float32))


def maybe_handoff_focal(
    cfg: IntrinsicsCfg,
    params: dict,
    state: IntrinsicsState,
    global_step: Array,
) -> dict:
    """At the stage boundary, overwrite the regressed focal with the window
    mean (the reference's `.data =` assignment, `intrinsics_softmin.py:79-81`)."""
    if not (isinstance(cfg, IntrinsicsSoftminCfg) and cfg.regression is not None):
        return params
    at_boundary = global_step == cfg.regression.after_step
    new_focal = jnp.where(
        at_boundary, jnp.mean(state.focal_window), params["focal_length"]
    )
    return {**params, "focal_length": new_focal}


def _focal_to_k(
    focal_length: Float[Array, ""],
    batch: Batch,
) -> Float[Array, "b f 3 3"]:
    b, f, _, h, w = batch.videos.shape
    k = focal_lengths_to_intrinsics(focal_length, (h, w))
    return jnp.broadcast_to(k, (b, f, 3, 3))


def _softmin_sweep(
    cfg: IntrinsicsSoftminCfg,
    num_frames: int,
    backward0: Float[Array, "b h w 2"],
    depths01: Float[Array, "b 2 h w"],
    weights0: Float[Array, "b h w"],
    key: jax.Array,
) -> tuple[Float[Array, "b f 3 3"], Float[Array, ""]]:
    """Stage-1 softmin over candidate focals (`intrinsics_softmin.py:84-141`).

    Returns the mixed intrinsics and the scalar focal estimate for the window.

    Exactly-equivalent rewrite of the reference sweep: every candidate shares
    the principal point, so candidate surfaces are elementwise scalings
    diag(1/fx_c, 1/fy_c, 1) of ONE unit-focal base surface, and bilinear
    sampling commutes with that scaling. One unprojection + one grid sample
    serve all candidates (the reference repeats both 60x); only the tiny
    per-candidate Procrustes solves and reprojections remain batched over n.
    """
    b, h, w, _ = backward0.shape
    f = num_frames
    n = cfg.num_candidates
    dtype = depths01.dtype
    k_points = cfg.num_procrustes_points

    candidates = jnp.linspace(
        cfg.min_focal_length, cfg.max_focal_length, n, dtype=dtype
    )
    candidate_k = focal_lengths_to_intrinsics(candidates, (h, w))  # (n, 3, 3)
    # diag entries of K_c^-1 (zero-skew, shared principal point).
    inv_scale = jnp.stack(
        [
            1.0 / candidate_k[:, 0, 0],
            1.0 / candidate_k[:, 1, 1],
            jnp.ones_like(candidates),
        ],
        axis=-1,
    )  # (n, 3)

    indices = jax.random.permutation(key, h * w)[:k_points]

    # Unit-focal base surfaces for frames 0 and 1.
    xy, _ = sample_image_grid((h, w), dtype=dtype)
    dirs = jnp.concatenate([xy - 0.5, jnp.ones_like(xy[..., :1])], axis=-1)
    base = dirs * depths01[:, :, :, :, None]  # (b, 2, h, w, 3)

    # Later-frame (frame 1) points at the sampled pixels.
    base_later = base[:, 1].reshape(b, h * w, 3)[:, indices]  # (b, k, 3)

    # Earlier-frame (frame 0) surface sampled where backward flow lands.
    xy_sub = xy.reshape(h * w, 2)[indices]
    xy_earlier = (xy + backward0).reshape(b, h * w, 2)[:, indices]
    base_earlier = grid_sample_points(
        base[:, 0].transpose(0, 3, 1, 2), xy_earlier, padding_mode="border"
    ).transpose(0, 2, 1)  # (b, k, 3)

    # Scale the shared base points into every candidate's camera space.
    p_later = base_later[:, None] * inv_scale[None, :, None]  # (b, n, k, 3)
    p_earlier = base_earlier[:, None] * inv_scale[None, :, None]

    point_weights = weights0.reshape(b, h * w)[:, indices]
    rel = align_rigid(
        p_later, p_earlier, jnp.broadcast_to(point_weights[:, None], (b, n, k_points))
    )  # (b, n, 4, 4): frame-1 camera space -> frame-0 camera space

    # Induced backward flow: project the aligned later points with K_c.
    # (With the chain [I, T], the reference's backward transformation for the
    # single pair reduces to T itself — `projection.py:165-184`.)
    cam = jnp.einsum(
        "bnij,bnkj->bnki",
        rel,
        jnp.concatenate([p_later, jnp.ones_like(p_later[..., :1])], axis=-1),
    )[..., :3]
    xy_flowed = project_camera_space(cam, candidate_k[None, :, None])

    flow = xy_flowed - xy_sub
    flow_gt = backward0[:, None].reshape(b, 1, h * w, 2)[:, :, indices]
    pixel_weights = point_weights[:, None, :, None]

    error = jnp.sum(jnp.abs((flow - flow_gt) * pixel_weights), axis=(-1, -2))  # (b, n)

    softmin_weights = jax.nn.softmax(
        -(error - jnp.min(error, axis=1, keepdims=True)) * 10.0, axis=1
    )
    mixed = jnp.einsum("bn,nij->bij", softmin_weights, candidate_k)
    focal_estimate = jnp.mean(jnp.einsum("bn,n->b", softmin_weights, candidates))

    intrinsics = jnp.broadcast_to(mixed[:, None], (b, f, 3, 3))
    return intrinsics, focal_estimate


def apply_intrinsics(
    cfg: IntrinsicsCfg,
    params: dict,
    state: IntrinsicsState,
    batch: Batch,
    flows: Flows,
    backbone_output: BackboneOutput,
    global_step: Array,
    key: jax.Array,
    train: bool = True,
) -> tuple[Float[Array, "b f 3 3"], IntrinsicsState]:
    """Compute per-frame intrinsics and the updated window state."""
    if isinstance(cfg, IntrinsicsGroundTruthCfg):
        assert batch.intrinsics is not None, "ground_truth intrinsics need GT"
        return batch.intrinsics, state

    if isinstance(cfg, IntrinsicsRegressedCfg):
        return _focal_to_k(params["focal_length"], batch), state

    assert isinstance(cfg, IntrinsicsSoftminCfg)
    f = batch.videos.shape[1]
    backward0 = flows.backward[:, 0]
    depths01 = backbone_output.depths[:, :2]
    weights0 = backbone_output.weights[:, 0]
    if cfg.regression is None:
        softmin_k, _ = _softmin_sweep(
            cfg, f, backward0, depths01, weights0, key
        )
        return softmin_k, state

    step = jnp.asarray(global_step)
    in_stage2 = step >= cfg.regression.after_step

    # Both stages compute every step and a `where` picks the active one.
    # A `lax.cond` matches the reference's dynamic stage switch
    # (`intrinsics_softmin.py:74-82`) and does skip the sweep's FLOPs in
    # stage 2 — but on TPU the conditional op serializes against the rest
    # of the program and costs ~9 ms/step of scheduling overhead against a
    # sweep whose actual compute is ~0.7 ms (measured; the sweep is tiny
    # next to the backbone). Unconditional compute is strictly faster in
    # BOTH stages.
    sweep_k, sweep_focal = _softmin_sweep(
        cfg, f, backward0, depths01, weights0, key
    )
    regressed_k = _focal_to_k(params["focal_length"], batch)
    intrinsics = jnp.where(in_stage2, regressed_k, sweep_k)
    focal_estimate = jnp.where(in_stage2, jnp.zeros(()), sweep_focal)

    # Ring-buffer update of the focal window during the trailing stage-1 steps.
    window = cfg.regression.window
    start = cfg.regression.after_step - window
    in_window = (step >= start) & (~in_stage2) & train
    slot = jnp.mod(step, window)
    new_window = state.focal_window.at[slot].set(
        jnp.where(
            in_window,
            jax.lax.stop_gradient(focal_estimate),
            state.focal_window[slot],
        )
    )
    return intrinsics, state.replace(focal_window=new_window)
