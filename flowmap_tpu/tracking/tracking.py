"""Point-track precomputation: segment scheduling, caching, and predictors.

Parity: `flowmap/tracking/__init__.py:31-110` — every `interval` frames, track
a (grid_size x grid_size) query grid over a ±`radius` window, with an
RGB-similarity visibility filter, cached on disk keyed by a content hash.

The CoTracker network port is staged work (`cotracker.py`); precomputed track
loading covers evaluation parity in the meantime.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..types import Batch, Flows, Tracks
from .tracker_flow_chain import TrackPredictorFlowChainCfg


@dataclass(frozen=True)
class TrackPredictorCoTrackerCfg:
    name: Literal["cotracker"] = "cotracker"
    grid_size: int = 35
    similarity_threshold: float = 0.2
    checkpoint: Optional[Path] = None


@dataclass(frozen=True)
class TrackPredictorPrecomputedCfg:
    """Load tracks precomputed offline (npz per segment)."""

    name: Literal["precomputed"] = "precomputed"
    path: Path = Path("tracks.npz")


TrackPredictorCfg = Union[
    TrackPredictorCoTrackerCfg,
    TrackPredictorFlowChainCfg,
    TrackPredictorPrecomputedCfg,
]


@dataclass(frozen=True)
class TrackPrecomputationCfg:
    interval: int = 5
    radius: int = 20
    cache_path: Optional[Path] = None


def get_cache_key(cfg: TrackPredictorCfg, pre_cfg: TrackPrecomputationCfg, batch: Batch) -> str:
    """Content-hash cache key (reference: `tracking/__init__.py:80-99`)."""
    payload = {
        "predictor": {k: str(v) for k, v in vars(cfg).items()},
        "precomputation": {
            "interval": pre_cfg.interval,
            "radius": pre_cfg.radius,
        },
        "scenes": list(batch.scenes),
        "shape": list(batch.videos.shape),
        "indices": np.asarray(batch.indices).tolist(),
    }
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()


def save_tracks(path: Path, tracks: list[Tracks]) -> None:
    arrays = {}
    for i, t in enumerate(tracks):
        arrays[f"xy_{i}"] = np.asarray(t.xy)
        arrays[f"visibility_{i}"] = np.asarray(t.visibility)
        arrays[f"start_{i}"] = np.asarray(t.start_frame)
    arrays["count"] = np.asarray(len(tracks))
    np.savez_compressed(path, **arrays)


def load_tracks(path: Path) -> list[Tracks]:
    data = np.load(path)
    count = int(data["count"])
    return [
        Tracks(
            xy=jnp.asarray(data[f"xy_{i}"]),
            visibility=jnp.asarray(data[f"visibility_{i}"]),
            start_frame=int(data[f"start_{i}"]),
        )
        for i in range(count)
    ]


def segment_windows(
    num_frames: int, interval: int, radius: int
) -> list[tuple[int, int]]:
    """Segment (start, stop) windows (reference: `tracking/__init__.py:49-58`)."""
    return [
        (max(center - radius, 0), min(center + radius + 1, num_frames))
        for center in range(0, num_frames, interval)
    ]


def compute_tracks(
    batch: Batch,
    cfg: TrackPredictorCfg,
    pre_cfg: TrackPrecomputationCfg,
    flows: "Flows | None" = None,
) -> list[Tracks]:
    """Precompute per-segment tracks, with optional disk caching."""
    if isinstance(cfg, TrackPredictorPrecomputedCfg):
        return load_tracks(cfg.path)

    cache_file = None
    if pre_cfg.cache_path is not None:
        key = get_cache_key(cfg, pre_cfg, batch)
        cache_file = Path(pre_cfg.cache_path) / f"{key}.npz"
        if cache_file.exists():
            return load_tracks(cache_file)

    if isinstance(cfg, TrackPredictorFlowChainCfg):
        assert flows is not None, "flow_chain tracker needs precomputed flows"
        from .tracker_flow_chain import generate_video_tracks_flow_chain

        tracks = generate_video_tracks_flow_chain(
            batch, flows, cfg, pre_cfg.interval, pre_cfg.radius
        )
    else:
        assert isinstance(cfg, TrackPredictorCoTrackerCfg)
        from .cotracker import generate_video_tracks

        tracks = generate_video_tracks(batch, cfg, pre_cfg)

    if cache_file is not None:
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        save_tracks(cache_file, tracks)
    return tracks


def pack_tracks(segments: list[Tracks], num_frames: int) -> "TracksPacked":
    """Pack ragged segments into a uniform-window `TracksPacked`.

    The common window length is the maximum segment length; each segment's
    start is clamped so start + L <= num_frames, its frames are placed at
    the corresponding offsets, and padding frames get visibility False (so
    losses are bitwise-identical to the ragged form).
    """
    from ..types import TracksPacked

    assert segments, "cannot pack an empty segment list"
    b, _, p, _ = segments[0].xy.shape
    length = min(max(t.xy.shape[1] for t in segments), num_frames)

    xys, vis, starts = [], [], []
    for t in segments:
        fs = t.xy.shape[1]
        start = min(t.start_frame, num_frames - length)
        offset = t.start_frame - start
        xy = np.full((b, length, p, 2), 0.5, np.float32)
        v = np.zeros((b, length, p), bool)
        xy[:, offset : offset + fs] = np.asarray(t.xy)
        v[:, offset : offset + fs] = np.asarray(t.visibility)
        xys.append(xy)
        vis.append(v)
        starts.append(start)

    return TracksPacked(
        xy=jnp.asarray(np.stack(xys, axis=1)),
        visibility=jnp.asarray(np.stack(vis, axis=1)),
        starts=jnp.asarray(starts, jnp.int32),
    )
