"""Flow-chaining point tracker (no pretrained weights required).

The reference's tracking supervision comes from CoTracker (torch.hub,
`flowmap/tracking/track_predictor_cotracker.py:20-56`): per segment, a query
grid tracked across a ±radius window with a visibility estimate. This module
produces the same (xy, visibility) supervision by *chaining the already
precomputed bidirectional optical flow*:

- positions propagate frame-to-frame by bilinear-sampling the dense flow
  field at the current track position;
- visibility combines in-frame checks with forward/backward flow cycle
  consistency (||F_fwd(x) + F_bwd(x + F_fwd(x))|| below a threshold),
  the standard occlusion test.

This is fully differentiable-free precompute (no_grad in the reference too),
runs entirely on TPU as a `lax.scan` over hops, and needs no checkpoint —
which makes the complete overfit pipeline (flow + tracking losses) runnable
end-to-end today. The CoTracker architecture port remains the parity path for
long-range tracks through occlusions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float

from ..ops.grid_sample import grid_sample_points
from ..types import Batch, Flows, Tracks


@dataclass(frozen=True)
class TrackPredictorFlowChainCfg:
    name: Literal["flow_chain"] = "flow_chain"
    grid_size: int = 35
    cycle_threshold: float = 0.02  # normalized-coordinate cycle error
    min_visibility: float = 0.5


def _sample_flow(
    flow_field: Float[Array, "h w 2"],
    xy: Float[Array, "p 2"],
) -> Float[Array, "p 2"]:
    out = grid_sample_points(
        flow_field.transpose(2, 0, 1)[None], xy[None], padding_mode="border"
    )[0]
    return out.transpose(1, 0)


def _chain_direction(
    flows_ahead: Float[Array, "n h w 2"],  # flow to apply at hop i
    flows_return: Float[Array, "n h w 2"],  # reverse flow for cycle check
    query: Float[Array, "p 2"],
    cycle_threshold: float,
):
    """Chain `query` through n hops; returns per-hop (positions, visibility)."""

    def body(carry, fields):
        xy, visible = carry
        fwd, bwd = fields
        step = _sample_flow(fwd, xy)
        new_xy = xy + step
        # Cycle consistency: following the reverse flow from the new position
        # should return to (approximately) the old position.
        back = _sample_flow(bwd, new_xy)
        cycle_error = jnp.linalg.norm(step + back, axis=-1)
        in_frame = jnp.all((new_xy >= 0.0) & (new_xy < 1.0), axis=-1)
        new_visible = visible & in_frame & (cycle_error < cycle_threshold)
        return (new_xy, new_visible), (new_xy, new_visible)

    p = query.shape[0]
    init = (query, jnp.ones((p,), dtype=bool))
    _, (positions, visibility) = jax.lax.scan(
        body, init, (flows_ahead, flows_return)
    )
    return positions, visibility


def chain_tracks_segment(
    flows: Flows,
    query: Float[Array, "p 2"],
    center: int,
    start: int,
    stop: int,
    cycle_threshold: float,
) -> Tracks:
    """Track `query` (on frame `center`) across [start, stop)."""
    p = query.shape[0]

    # Backward chain: center -> center-1 -> ... -> start.
    n_back = center - start
    if n_back > 0:
        ahead = jnp.flip(flows.backward[0, start:center], axis=0)
        back = jnp.flip(flows.forward[0, start:center], axis=0)
        pos_b, vis_b = _chain_direction(ahead, back, query, cycle_threshold)
        pos_b = jnp.flip(pos_b, axis=0)
        vis_b = jnp.flip(vis_b, axis=0)
    else:
        pos_b = jnp.zeros((0, p, 2))
        vis_b = jnp.zeros((0, p), dtype=bool)

    # Forward chain: center -> center+1 -> ... -> stop-1.
    n_fwd = stop - 1 - center
    if n_fwd > 0:
        ahead = flows.forward[0, center : stop - 1]
        back = flows.backward[0, center : stop - 1]
        pos_f, vis_f = _chain_direction(ahead, back, query, cycle_threshold)
    else:
        pos_f = jnp.zeros((0, p, 2))
        vis_f = jnp.zeros((0, p), dtype=bool)

    xy = jnp.concatenate([pos_b, query[None], pos_f], axis=0)
    visibility = jnp.concatenate(
        [vis_b, jnp.ones((1, p), dtype=bool), vis_f], axis=0
    )
    return Tracks(xy=xy[None], visibility=visibility[None], start_frame=start)


def generate_video_tracks_flow_chain(
    batch: Batch,
    flows: Flows,
    cfg: TrackPredictorFlowChainCfg,
    interval: int = 5,
    radius: int = 20,
) -> list[Tracks]:
    """Segment scheduling identical to the reference
    (`tracking/__init__.py:49-70`), with flow-chained tracks."""
    f = batch.videos.shape[1]
    g = cfg.grid_size
    gx = (np.arange(g) + 0.5) / g
    gy = (np.arange(g) + 0.5) / g
    query = jnp.asarray(
        np.stack(np.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2),
        jnp.float32,
    )

    segments = []
    for center in range(0, f, interval):
        start = max(center - radius, 0)
        stop = min(center + radius + 1, f)
        segments.append(
            chain_tracks_segment(
                flows, query, center, start, stop, cfg.cycle_threshold
            )
        )
    return segments
