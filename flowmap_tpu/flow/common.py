"""Bidirectional flow machinery shared by all flow predictors.

Parity: `flowmap/flow/flow_predictor.py:39-103` — photometric consistency
masks ((1 - max|Δrgb|)^8 via flow-warped sampling), bilinear rescaling of flow
fields and masks to the model resolution, and the bidirectional compute
(predictor on the video and on the time-reversed video).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from ..ops.geometry import sample_image_grid
from ..ops.grid_sample import grid_sample_2d
from ..ops.resize import resize_bilinear
from ..types import Batch, Flows


def rescale_flow(
    flow: Float[Array, "b p h w 2"],
    shape: tuple[int, int],
) -> Float[Array, "b p h2 w2 2"]:
    b, p, h, w, _ = flow.shape
    out = resize_bilinear(
        flow.reshape(b * p, h, w, 2).transpose(0, 3, 1, 2), shape
    )
    return out.transpose(0, 2, 3, 1).reshape(b, p, *shape, 2)


def rescale_mask(
    mask: Float[Array, "b p h w"],
    shape: tuple[int, int],
) -> Float[Array, "b p h2 w2"]:
    b, p, h, w = mask.shape
    out = resize_bilinear(mask.reshape(b * p, 1, h, w), shape)
    return out.reshape(b, p, *shape)


def compute_consistency_mask(
    videos: Float[Array, "b f 3 h w"],
    flow: Float[Array, "b p h w 2"],
    warp_dtype=jnp.float32,
) -> Float[Array, "b p h w"]:
    """Photometric-consistency weight: warp the target frame back by the flow
    and compare colors ((1 - max channel delta)^8).

    `warp_dtype` controls the dense-warp contraction precision: when the
    flow itself came from a bf16 net (the pretrain config), sampling the
    rgb in bf16 adds ~0.4% to deltas already carrying bf16-flow noise and
    halves the warp kernel's MXU time."""
    b, f, c, h, w = videos.shape
    source = videos[:, :-1].reshape(b * (f - 1), c, h, w)
    target = videos[:, 1:].reshape(b * (f - 1), c, h, w)

    source_xy, _ = sample_image_grid((h, w), dtype=videos.dtype)
    # Dense unbounded warp: the one-hot MXU kernel (ops/pallas/dense_warp.py)
    # — TPU gathers of c=3 rows are serial-unit-bound (measured 1.4 s/step
    # at the pretrain shape, 61% of the step; round-5 log). Forward-only is
    # fine: the mask is supervision, always consumed under stop_gradient.
    # Coordinates go in PLANAR (x / y) form: a trailing (..., 2) pixel-
    # coordinate array puts 2 on the lane axis, and the resulting ~64x tile
    # padding cost a measured 80 ms/step of pads + elementwise at the
    # pretrain shape (docs/PERF_R5.md, round-5 correction).
    from ..ops.pallas.dense_warp import dense_warp_bilinear_planar

    flow_pairs = flow.reshape(b * (f - 1), h, w, 2)
    px = jax.lax.stop_gradient(
        (source_xy[..., 0] + flow_pairs[..., 0]) * w - 0.5
    )
    py = jax.lax.stop_gradient(
        (source_xy[..., 1] + flow_pairs[..., 1]) * h - 0.5
    )
    target_pixels = dense_warp_bilinear_planar(
        jax.lax.stop_gradient(target), px, py, "zeros", warp_dtype
    )
    deltas = jnp.max(jnp.abs(source - target_pixels), axis=1)
    return ((1.0 - deltas) ** 8).reshape(b, f - 1, h, w)


def compute_bidirectional_flow(
    predict: Callable[[Float[Array, "b f 3 h w"]], Float[Array, "b p h w 2"]],
    batch: Batch,
    flow_shape: tuple[int, int],
    mask_warp_dtype=None,
) -> Flows:
    """Run `predict` on the video and its time reversal; normalize, mask,
    rescale (reference: `flow_predictor.py:82-103`).

    `mask_warp_dtype` defaults to the predictor's own `compute_dtype` when
    it exposes one (see compute_consistency_mask), else float32."""
    if mask_warp_dtype is None:
        mask_warp_dtype = getattr(
            predict, "compute_dtype",
            getattr(getattr(predict, "__self__", None), "compute_dtype", None),
        ) or jnp.float32
    forward = predict(batch.videos)
    forward_mask = compute_consistency_mask(
        batch.videos, forward, mask_warp_dtype
    )
    forward = rescale_flow(forward, flow_shape)
    forward_mask = rescale_mask(forward_mask, flow_shape)

    backward_videos = jnp.flip(batch.videos, axis=1)
    backward = predict(backward_videos)
    backward_mask = compute_consistency_mask(
        backward_videos, backward, mask_warp_dtype
    )
    backward = rescale_flow(backward, flow_shape)
    backward_mask = rescale_mask(backward_mask, flow_shape)

    backward = jnp.flip(backward, axis=1)
    backward_mask = jnp.flip(backward_mask, axis=1)

    return Flows(
        forward=forward,
        backward=backward,
        forward_mask=forward_mask,
        backward_mask=backward_mask,
    )
