"""Synthetic rigid-scene generator for tests and benchmarks.

Zero-egress substitute for real scenes + pretrained flow networks: build a
piecewise-planar world, a smooth camera trajectory, and ground-truth
intrinsics; per-frame depth comes from closed-form ray/plane intersection, and
the "observed" optical flow is the exact pose/depth-induced flow of the rigid
scene. A correct optimizer must then drive ATE toward zero under the same loss
the reference uses — this is the end-to-end correctness fixture SURVEY.md §4
calls for.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (
    compute_backward_flow,
    compute_forward_flow,
    focal_lengths_to_intrinsics,
    intrinsics_inverse,
    sample_image_grid,
    unproject,
)
from ..ops.surface import compute_track_flow
from ..types import Batch, Flows, Tracks


@dataclass(frozen=True)
class SyntheticSceneCfg:
    num_frames: int = 20
    image_shape: tuple[int, int] = (96, 128)
    focal_length: float = 1.1  # normalized (sqrt(hw) convention)
    seed: int = 0


def _camera_trajectory(num_frames: int, rng: np.random.Generator) -> np.ndarray:
    """Smooth forward-and-sideways arc with mild rotation (c2w, OpenCV)."""
    poses = np.zeros((num_frames, 4, 4))
    ts = np.linspace(0.0, 1.0, num_frames)
    for i, t in enumerate(ts):
        yaw = 0.3 * np.sin(2 * np.pi * t * 0.5)
        pitch = 0.1 * np.sin(2 * np.pi * t * 0.3)
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        poses[i, :3, :3] = ry @ rx
        poses[i, :3, 3] = [0.8 * np.sin(np.pi * t), 0.2 * t, 0.9 * t]
        poses[i, 3, 3] = 1.0
    return poses


def _plane_depth(
    xy: jnp.ndarray,  # (h, w, 2) normalized grid
    intrinsics: jnp.ndarray,  # (3, 3)
    extrinsics: jnp.ndarray,  # (4, 4) c2w
    planes: list[tuple[np.ndarray, float]],  # (normal, offset): n.x = d
) -> jnp.ndarray:
    """Per-pixel depth as the nearest positive ray/plane intersection."""
    rays_cam = jnp.einsum(
        "ij,hwj->hwi",
        intrinsics_inverse(intrinsics),
        jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1),
    )
    r = extrinsics[:3, :3]
    t = extrinsics[:3, 3]
    rays_world = jnp.einsum("ij,hwj->hwi", r, rays_cam)
    best = jnp.full(xy.shape[:2], jnp.inf)
    for normal, offset in planes:
        n = jnp.asarray(normal, dtype=xy.dtype)
        denom = jnp.einsum("hwi,i->hw", rays_world, n)
        z = (offset - jnp.dot(t, n)) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        z = jnp.where((z > 0.05) & (jnp.abs(denom) >= 1e-6), z, jnp.inf)
        best = jnp.minimum(best, z)
    # Cap at a far plane so degenerate rays stay finite.
    return jnp.where(jnp.isfinite(best), best, 50.0)


def make_scene(cfg: SyntheticSceneCfg) -> tuple[Batch, Flows, jnp.ndarray]:
    """Returns (batch with GT cameras, exact flows, GT depths (1,f,h,w))."""
    rng = np.random.default_rng(cfg.seed)
    f = cfg.num_frames
    h, w = cfg.image_shape

    poses = jnp.asarray(_camera_trajectory(f, rng), dtype=jnp.float32)
    k = focal_lengths_to_intrinsics(
        jnp.asarray(cfg.focal_length, jnp.float32), (h, w)
    )
    intrinsics = jnp.broadcast_to(k, (f, 3, 3))

    # A loose "room": floor, two side walls, and a back wall ahead of the
    # trajectory end — gives depth variation without degenerate geometry.
    planes = [
        (np.array([0.0, 1.0, 0.0]), 2.0),  # floor (y down = +)
        (np.array([1.0, 0.0, 0.2]), 4.0),  # right wall
        (np.array([-1.0, 0.0, 0.2]), 4.0),  # left wall
        (np.array([0.0, 0.0, 1.0]), 8.0),  # back wall
    ]

    xy, _ = sample_image_grid((h, w))
    depths = jnp.stack(
        [_plane_depth(xy, intrinsics[i], poses[i], planes) for i in range(f)]
    )[None]

    surfaces = unproject(
        xy, depths, intrinsics[None, :, None, None]
    )  # (1, f, h, w, 3)
    poses_b = poses[None]
    intr_b = intrinsics[None]

    flow_fwd = compute_forward_flow(surfaces, poses_b, intr_b) - xy
    flow_bwd = compute_backward_flow(surfaces, poses_b, intr_b) - xy

    # Mask out pixels whose correspondence leaves the frame (occlusion-free
    # piecewise-planar world: out-of-frame is the only failure mode).
    def in_frame_mask(flowed):
        return (
            jnp.all(flowed >= 0.0, axis=-1) & jnp.all(flowed < 1.0, axis=-1)
        ).astype(jnp.float32)

    flows = Flows(
        forward=flow_fwd,
        backward=flow_bwd,
        forward_mask=in_frame_mask(flow_fwd + xy),
        backward_mask=in_frame_mask(flow_bwd + xy),
    )

    # Simple procedural texture so visualizations/photometric ops have content.
    u = np.linspace(0, 8 * np.pi, w)
    v = np.linspace(0, 8 * np.pi, h)
    tex = 0.5 + 0.25 * (np.sin(u)[None, :] + np.cos(v)[:, None])
    videos = jnp.broadcast_to(
        jnp.asarray(tex, jnp.float32)[None, None, None], (1, f, 3, h, w)
    )

    batch = Batch(
        videos=videos,
        indices=jnp.arange(f)[None],
        extrinsics=poses_b,
        intrinsics=intr_b,
        scenes=("synthetic",),
        datasets=("synthetic",),
    )
    return batch, flows, depths


def make_track_segments(
    batch: Batch,
    depths: jnp.ndarray,
    interval: int = 5,
    radius: int = 20,
    grid_size: int = 35,
) -> list[Tracks]:
    """Exact tracks in the reference's segment structure: every `interval`
    frames, a (grid_size x grid_size) query grid tracked over a ±`radius`
    window (reference: `flowmap/tracking/__init__.py:49-70`)."""
    _, f, _, h, w = batch.videos.shape
    xy, _ = sample_image_grid((h, w))
    surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])

    # Query grid (matches CoTracker's grid query layout closely enough for
    # workload parity).
    gx = (np.arange(grid_size) + 0.5) / grid_size
    gy = (np.arange(grid_size) + 0.5) / grid_size
    query = np.stack(np.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)
    query = jnp.asarray(query, jnp.float32)[None]  # (1, p, 2)
    p = query.shape[1]

    segments = []
    for center in range(0, f, interval):
        start = max(center - radius, 0)
        stop = min(center + radius + 1, f)
        fs = stop - start
        seg_surfaces = surfaces[:, start:stop]
        seg_ext = batch.extrinsics[:, start:stop]
        seg_int = batch.intrinsics[:, start:stop]
        source = Tracks(
            xy=jnp.broadcast_to(query[:, None], (1, fs, p, 2)),
            visibility=jnp.ones((1, fs, p), dtype=bool),
            start_frame=0,
        )
        xy_target, visibility = compute_track_flow(
            seg_surfaces, seg_ext, seg_int, source
        )
        ci = center - start  # index of the query frame within the segment
        segments.append(
            Tracks(
                xy=xy_target[:, ci],
                visibility=visibility[:, ci],
                start_frame=start,
            )
        )
    return segments


def make_tracks(
    batch: Batch,
    depths: jnp.ndarray,
    num_points: int = 64,
    seed: int = 0,
) -> list[Tracks]:
    """Exact point tracks from the GT geometry (one whole-video segment)."""
    rng = np.random.default_rng(seed)
    _, f, _, h, w = batch.videos.shape
    xy, _ = sample_image_grid((h, w))
    surfaces = unproject(
        xy, depths, batch.intrinsics[:, :, None, None]
    )
    query = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(1, num_points, 2)), jnp.float32
    )
    # Track the queried frame-0 points into every frame via GT geometry:
    # reproject frame-0 surface points through each camera.
    track_source = Tracks(
        xy=jnp.broadcast_to(query[:, None], (1, f, num_points, 2)),
        visibility=jnp.ones((1, f, num_points), dtype=bool),
        start_frame=0,
    )
    xy_target, visibility = compute_track_flow(
        surfaces, batch.extrinsics, batch.intrinsics, track_source
    )
    # Use source frame 0's reprojections as the track trajectory.
    return [
        Tracks(
            xy=xy_target[:, 0],  # (1, ft, p, 2)
            visibility=visibility[:, 0],
            start_frame=0,
        )
    ]
