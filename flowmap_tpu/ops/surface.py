"""Surface alignment and track reprojection — the pose-from-depth core.

Parity targets: `flowmap/model/projection.py:213-298` (align_surfaces,
compute_track_flow) in the reference. Both are pure functions over pytrees and
fully batched; `align_surfaces` is additionally vmap-able over intrinsics
candidates (the softmin module relies on this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jaxtyping import Array, Bool, Float, Int

from ..types import Tracks, TracksPacked
from .geometry import (
    earlier,
    get_extrinsics,
    later,
    reproject_points,
    rigid_inverse,
    sample_image_grid,
)
from .grid_sample import grid_sample_points
from .procrustes import align_rigid


def align_surfaces(
    surfaces: Float[Array, "b f h w 3"],
    backward_flows: Float[Array, "b p h w 2"],
    backward_weights: Float[Array, "b p h w"],
    indices: Int[Array, " k"],
) -> Float[Array, "b f 4 4"]:
    """Estimate camera poses by Procrustes-aligning flow-corresponded surfaces.

    For each adjacent frame pair: take later-frame surface points at `indices`,
    find where backward flow sends their pixels in the earlier frame, bilinearly
    sample the earlier surface there, and solve for the rigid transform between
    the two 3D point sets; then chain the per-pair transforms into poses
    (P_0 = I). Reference: `projection.py:213-252`.
    """
    b, f, h, w, _ = surfaces.shape
    xy, _ = sample_image_grid((h, w), dtype=surfaces.dtype)

    # Explicit-collectives mode (parallel/collectives.py): when the step is
    # traced under `explicit_collectives` and the frame axis divides the
    # mesh, the cross-shard pieces — the later-frame halo and the pose-chain
    # prefix product — use the hand-written shard_map primitives instead of
    # GSPMD-generated ones. Numerically identical (tests/test_explicit_step.py).
    from ..parallel.collectives import (
        current_explicit_mesh,
        explicit_pose_chain,
        shifted_next_frames,
    )

    ctx = current_explicit_mesh()
    explicit = (
        ctx is not None and b == 1 and f % ctx[0].shape[ctx[1]] == 0
    )

    # Later-frame 3D points at the selected pixels.
    if explicit:
        later_surfaces = shifted_next_frames(surfaces[0], *ctx)[None][:, : f - 1]
    else:
        later_surfaces = later(surfaces)
    xyz_later = later_surfaces.reshape(b, f - 1, h * w, 3)[:, :, indices]

    # Where those pixels land in the earlier frame (backward flow displaces
    # the pixel grid), at the selected pixels.
    xy_earlier = (xy + backward_flows).reshape(b, f - 1, h * w, 2)[:, :, indices]

    # Sample the earlier-frame surface at the flowed locations.
    k = indices.shape[0]
    xyz_earlier = grid_sample_points(
        earlier(surfaces).reshape(b * (f - 1), h, w, 3).transpose(0, 3, 1, 2),
        xy_earlier.reshape(b * (f - 1), k, 2),
        padding_mode="border",
    )
    xyz_earlier = xyz_earlier.transpose(0, 2, 1).reshape(b, f - 1, k, 3)

    weights = backward_weights.reshape(b, f - 1, h * w)[..., indices]
    inverse_relative_transformations = align_rigid(xyz_later, xyz_earlier, weights)
    if explicit:
        return explicit_pose_chain(inverse_relative_transformations[0], *ctx)[None]
    return get_extrinsics(inverse_relative_transformations)


def compute_track_flow(
    surfaces: Float[Array, "b f h w 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
    tracks: Tracks,
) -> tuple[
    Float[Array, "b fs ft p 2"],  # reprojected track locations
    Bool[Array, "b fs ft p"],  # joint visibility / in-frame mask
]:
    """Reproject track-sampled surface points from every source frame into
    every target frame. Reference: `projection.py:255-298`."""
    b, f, h, w, _ = surfaces.shape
    p = tracks.xy.shape[2]

    # Sample the surfaces at the track locations.
    xyz = grid_sample_points(
        surfaces.reshape(b * f, h, w, 3).transpose(0, 3, 1, 2),
        tracks.xy.reshape(b * f, p, 2),
        padding_mode="border",
    )
    xyz = xyz.transpose(0, 2, 1).reshape(b, f, p, 3)

    # Broadcast layout: (b, fs, ft, p, ...).
    xy_source = tracks.xy[:, :, None]  # b fs 1 p 2
    xyz_source = xyz[:, :, None]  # b fs 1 p 3
    extrinsics_source = extrinsics[:, :, None, None]  # b fs 1 1 4 4
    extrinsics_target_inv = rigid_inverse(extrinsics)[:, None, :, None]  # b 1 ft 1 4 4
    intrinsics_target = intrinsics[:, None, :, None]  # b 1 ft 1 3 3
    visibility_source = tracks.visibility[:, :, None]  # b fs 1 p
    visibility_target = tracks.visibility[:, None]  # b 1 ft p

    relative = jnp.einsum(
        "...ij,...jk->...ik", extrinsics_target_inv, extrinsics_source
    )
    xy_target = reproject_points(xyz_source, relative, intrinsics_target)
    visibility = visibility_source & visibility_target

    source_in_frame = jnp.all(xy_source >= 0, axis=-1) & jnp.all(
        xy_source < 1, axis=-1
    )
    target_in_frame = jnp.all(xy_target >= 0, axis=-1) & jnp.all(
        xy_target < 1, axis=-1
    )
    visibility = visibility & source_in_frame & target_in_frame

    return xy_target, visibility


def sample_track_points_packed(
    surfaces: Float[Array, "b f h w 3"],
    packed: TracksPacked,
) -> tuple[Float[Array, "s l p 3"], Int[Array, "s l"]]:
    """Bilinear-sample the surfaces at every packed track location.

    TPU formulation: per-segment frames come from ONE whole-frame-row gather
    (`surfaces[frame_idx]` — large contiguous rows, cheap), and the bilinear
    point sampling is SEPARABLE ONE-HOT MATMULS (see
    `grid_sample.grid_sample_points`): the backward w.r.t. the surfaces is
    then transposed matmuls plus a per-frame segment reduction — no
    scatter-add anywhere (XLA's TPU scatter made the original flat-gather
    form's backward ~6x the cost of the rest of the loss combined).
    """
    from .grid_sample import bilinear_onehot_weights

    b, f, h, w, _ = surfaces.shape
    _, s, l, p, _ = packed.xy.shape
    assert b == 1, "packed track flow currently supports batch size 1"

    frame_idx = packed.starts[:, None] + jnp.arange(l)  # (s, l)

    # Bilinear sample surfaces[frame_idx] at the track xy (border padding).
    x = packed.xy[0, ..., 0] * w - 0.5  # (s, l, p)
    y = packed.xy[0, ..., 1] * h - 0.5
    dtype = surfaces.dtype
    wx = bilinear_onehot_weights(x, w, "border", dtype)  # (s, l, p, w)
    wy = bilinear_onehot_weights(y, h, "border", dtype)  # (s, l, p, h)

    seg_surfaces = surfaces[0][frame_idx]  # (s, l, h, w, 3) — whole-row gather
    rows = jnp.einsum("slpx,slyxc->slpyc", wx, seg_surfaces)
    xyz = jnp.einsum("slpy,slpyc->slpc", wy, rows)  # (s, l, p, 3)
    return xyz, frame_idx


def compute_track_flow_packed(
    surfaces: Float[Array, "b f h w 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
    packed: TracksPacked,
) -> tuple[
    Float[Array, "b s fs ft p 2"],  # reprojected track locations
    Bool[Array, "b s fs ft p"],  # joint visibility mask
]:
    """`compute_track_flow` over all packed segments at once.

    See `sample_track_points_packed` for the sampling formulation.
    """
    xyz, frame_idx = sample_track_points_packed(surfaces, packed)

    seg_extrinsics = extrinsics[0][frame_idx]  # (s, l, 4, 4)
    seg_intrinsics = intrinsics[0][frame_idx]  # (s, l, 3, 3)

    # All-pairs reprojection within each segment: (s, fs, ft, p, ...).
    relative = jnp.einsum(
        "stij,sfjk->sftik", rigid_inverse(seg_extrinsics), seg_extrinsics
    )  # maps source-frame (f) camera space into target-frame (t) space
    xy_target = reproject_points(
        xyz[:, :, None], relative[..., None, :, :], seg_intrinsics[:, None, :, None]
    )  # (s, fs, ft, p, 2)

    visibility = packed.visibility[0]  # (s, l, p)
    joint = visibility[:, :, None] & visibility[:, None]
    xy_source = packed.xy[0][:, :, None]  # (s, fs, 1, p, 2)
    source_in = jnp.all(xy_source >= 0, -1) & jnp.all(xy_source < 1, -1)
    target_in = jnp.all(xy_target >= 0, -1) & jnp.all(xy_target < 1, -1)
    out_visibility = joint & source_in & target_in

    return xy_target[None], out_visibility[None]
