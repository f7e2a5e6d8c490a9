"""CoTracker track predictor: query grids -> per-segment Tracks.

Parity: `flowmap/tracking/track_predictor_cotracker.py:26-56` — per segment,
track a (grid_size x grid_size) query grid from the segment's center frame
with backward tracking, normalize coordinates, and gate visibility by RGB
similarity to the query frame.

The network itself (CoTracker w8 sliding-window transformer) lives in
`cotracker_net.py`. Weights come from `cfg.checkpoint` (a torch state_dict
converted by `convert_cotracker_state_dict`); without a checkpoint the
predictor refuses by default — randomly initialized tracks would silently
poison the tracking loss — unless `allow_random_init` is set (tests/smoke).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_points
from ..types import Batch, Tracks
from .cotracker_net import (
    CoTrackerNetCfg,
    convert_cotracker_state_dict,
    cotracker_init,
    track_points,
)

_ALLOW_RANDOM_INIT = False  # tests flip this via enable_random_init()


def enable_random_init(value: bool = True) -> None:
    global _ALLOW_RANDOM_INIT
    _ALLOW_RANDOM_INIT = value


def load_params(cfg, net_cfg: CoTrackerNetCfg | None = None) -> dict:
    net_cfg = net_cfg or CoTrackerNetCfg()
    if getattr(cfg, "checkpoint", None) is not None:
        import torch

        sd = torch.load(cfg.checkpoint, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        sd = {k: v.numpy() for k, v in sd.items()}
        return convert_cotracker_state_dict(sd, net_cfg)
    if not _ALLOW_RANDOM_INIT:
        raise ValueError(
            "tracking=cotracker needs a checkpoint (cfg.checkpoint=...): the "
            "torch.hub cotracker_w8 weights, converted on load. Use "
            "tracking=flow_chain for a weight-free tracker."
        )
    return cotracker_init(jax.random.PRNGKey(0), net_cfg)


def _query_grid(grid_size: int) -> jnp.ndarray:
    """grid_size^2 queries, cell-centered in [0, 1]^2 (torch.hub grid init)."""
    xs = (np.arange(grid_size) + 0.5) / grid_size
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    return jnp.asarray(
        np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1), jnp.float32
    )


def generate_video_tracks(
    batch: Batch,
    cfg,
    pre_cfg,
    params: dict | None = None,
    net_cfg: CoTrackerNetCfg | None = None,
) -> list[Tracks]:
    from .tracking import segment_windows

    if net_cfg is None:
        net_cfg = CoTrackerNetCfg()
    if params is None:
        params = load_params(cfg, net_cfg)

    b, f, _, h, w = batch.videos.shape
    assert b == 1, "track precompute runs per scene"
    queries = _query_grid(cfg.grid_size)

    tracks = []
    for start, stop in segment_windows(f, pre_cfg.interval, pre_cfg.radius):
        center = min(start + pre_cfg.radius, f - 1)
        video = batch.videos[0, start:stop]
        xy, vis_logits = track_points(
            params, net_cfg, video, queries, center - start
        )
        visibility = jax.nn.sigmoid(vis_logits) > 0.5

        # RGB similarity filter (track_predictor_cotracker.py:42-53): a
        # track whose color departs from its query-frame color is occluded.
        rgb = grid_sample_points(video, xy, padding_mode="zeros")  # (f', 3, n)
        delta = jnp.linalg.norm(
            rgb - rgb[center - start : center - start + 1], axis=1
        )
        visibility = visibility & (delta < cfg.similarity_threshold)

        tracks.append(
            Tracks(
                xy=xy[None],
                visibility=visibility[None],
                start_frame=start,
            )
        )
    return tracks
