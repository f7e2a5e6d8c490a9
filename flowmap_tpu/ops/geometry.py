"""Differentiable projective geometry core.

Behavioral parity with the reference's `flowmap/model/projection.py`, but
designed for XLA:

- Rigid 4x4 inverses are closed-form (R^T, -R^T t) rather than general
  `inverse()` calls (reference: `projection.py:46,154,176,288` uses
  `torch.Tensor.inverse`), which removes LU solves from the autodiff graph.
- Pinhole intrinsics inverses are closed-form (reference: `projection.py:86`
  uses `intrinsics.inverse()`); this is exact for all intrinsics produced in
  this framework (zero skew, last row (0,0,1) — softmin-mixed candidates keep
  that form because the mixture weights sum to 1).
- The pose chain (reference: `projection.py:187-210`, a Python loop that is
  serial in frame count) is a `jax.lax.associative_scan` over 4x4 matmuls:
  log-depth, vectorizes over the MXU, and maps onto a distributed prefix
  product when the frame axis is sharded.

All coordinates follow the reference convention: normalized image coordinates
in [0, 1] with half-pixel centers; intrinsics normalized by image size;
extrinsics camera-to-world.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jaxtyping import Array, Bool, Float


def homogenize_points(points: Float[Array, "*b d"]) -> Float[Array, "*b d1"]:
    """(x, y, z) -> (x, y, z, 1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Float[Array, "*b d"]) -> Float[Array, "*b d1"]:
    """(x, y, z) -> (x, y, z, 0)."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(
    homogeneous_coordinates: Float[Array, "*b d"],
    transformation: Float[Array, "*b d d"],
) -> Float[Array, "*b d"]:
    """Apply a rigid-body transformation to points or vectors."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous_coordinates)


def rigid_inverse(transformation: Float[Array, "*b 4 4"]) -> Float[Array, "*b 4 4"]:
    """Closed-form inverse of a rigid transform: [[R^T, -R^T t], [0, 1]]."""
    r = transformation[..., :3, :3]
    t = transformation[..., :3, 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t)
    top = jnp.concatenate([r_inv, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=transformation.dtype),
        (*top.shape[:-2], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_cam2world(
    homogeneous_coordinates: Float[Array, "*b d"],
    extrinsics: Float[Array, "*b d d"],
) -> Float[Array, "*b d"]:
    """Camera space -> world space (extrinsics are cam2world)."""
    return transform_rigid(homogeneous_coordinates, extrinsics)


def transform_world2cam(
    homogeneous_coordinates: Float[Array, "*b d"],
    extrinsics: Float[Array, "*b d d"],
) -> Float[Array, "*b d"]:
    """World space -> camera space (closed-form rigid inverse of cam2world)."""
    return transform_rigid(homogeneous_coordinates, rigid_inverse(extrinsics))


def intrinsics_inverse(intrinsics: Float[Array, "*b 3 3"]) -> Float[Array, "*b 3 3"]:
    """Closed-form inverse of a zero-skew pinhole K = [[fx,0,cx],[0,fy,cy],[0,0,1]]."""
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    rows = jnp.stack(
        [
            jnp.stack([inv_fx, zero, -cx * inv_fx], axis=-1),
            jnp.stack([zero, inv_fy, -cy * inv_fy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return rows


def project_camera_space(
    points: Float[Array, "*b d"],
    intrinsics: Float[Array, "*b d d"],
    epsilon: float = 1e-5,
    infinity: float = 1e8,
) -> Float[Array, "*b d_minus_1"]:
    """Perspective-divide then apply intrinsics (reference: `projection.py:49-58`).

    Componentwise rather than an einsum against the K matrix: the callers
    broadcast a (b, f, 1, 1, 3, 3) K over a pixel grid, and a matrix einsum
    makes XLA materialize the broadcast K at grid resolution (GBs of HBM
    traffic at reference scale). Scalar components fuse into one elementwise
    loop. Assumes K's last row is (0, 0, 1), which holds for every K in this
    framework (same assumption as `intrinsics_inverse`).
    """
    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]
    denom = z + epsilon
    nan = lambda q: jnp.nan_to_num(q, posinf=infinity, neginf=-infinity)
    xn = nan(x / denom)
    yn = nan(y / denom)
    zn = nan(z / denom)
    u = (
        intrinsics[..., 0, 0] * xn
        + intrinsics[..., 0, 1] * yn
        + intrinsics[..., 0, 2] * zn
    )
    v = (
        intrinsics[..., 1, 0] * xn
        + intrinsics[..., 1, 1] * yn
        + intrinsics[..., 1, 2] * zn
    )
    return jnp.stack([u, v], axis=-1)


def project(
    points: Float[Array, "*b 3"],
    extrinsics: Float[Array, "*b 4 4"],
    intrinsics: Float[Array, "*b 3 3"],
    epsilon: float = 1e-5,
) -> tuple[Float[Array, "*b 2"], Bool[Array, "*b"]]:
    """World-space points -> normalized image coordinates + in-front mask."""
    points_h = homogenize_points(points)
    cam = transform_world2cam(points_h, extrinsics)[..., :-1]
    in_front = cam[..., -1] >= 0
    return project_camera_space(cam, intrinsics, epsilon=epsilon), in_front


def unproject(
    coordinates: Float[Array, "*b 2"],
    z: Float[Array, "*b"],
    intrinsics: Float[Array, "*b 3 3"],
) -> Float[Array, "*b 3"]:
    """Lift normalized 2D coordinates with depth z to camera-space 3D points.

    Componentwise K^-1 application (x - cx)/fx etc. — the matrix-einsum form
    materializes the broadcast (b, f, 1, 1, 3, 3) inverse at grid resolution
    (~2 GB at reference scale); the component form fuses into the surrounding
    elementwise graph. Zero-skew K assumed (as everywhere in this framework).
    """
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    rx = (coordinates[..., 0] - cx) / fx
    ry = (coordinates[..., 1] - cy) / fy
    return jnp.stack([rx * z, ry * z, z], axis=-1)


def sample_image_grid(
    shape: tuple[int, ...],
    dtype=jnp.float32,
) -> tuple[Float[Array, "*s d"], Array]:
    """Normalized (0,1) half-pixel-centered coordinates and integer indices.

    Matches reference `projection.py:93-113`: `coordinates[..., k]` is the
    (x, y, ...) float coordinate (reversed axis order w.r.t. array indexing);
    `indices[..., k]` is the (i, j, ...) integer index.
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coordinates = [
        (idx.astype(dtype) + 0.5) / length for idx, length in zip(indices, shape)
    ]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def reproject_points(
    xyz: Float[Array, "*b 3"],
    relative_transformations: Float[Array, "*b 4 4"],
    intrinsics: Float[Array, "*b 3 3"],
) -> Float[Array, "*b 2"]:
    """Apply a relative camera transform to camera-space points, then project.

    Componentwise 4x4 application — see `project_camera_space` for why the
    broadcast matrix einsum is avoided on the hot path.
    """
    t = relative_transformations
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    out = jnp.stack(
        [
            t[..., 0, 0] * x + t[..., 0, 1] * y + t[..., 0, 2] * z + t[..., 0, 3],
            t[..., 1, 0] * x + t[..., 1, 1] * y + t[..., 1, 2] * z + t[..., 1, 3],
            t[..., 2, 0] * x + t[..., 2, 1] * y + t[..., 2, 2] * z + t[..., 2, 3],
        ],
        axis=-1,
    )
    return project_camera_space(out, intrinsics)


def earlier(x):
    """Select frames [0, f-1) along axis 1 (batch, frame, ...)."""
    return x[:, :-1]


def later(x):
    """Select frames [1, f) along axis 1 (batch, frame, ...)."""
    return x[:, 1:]


def _expand_for_grid(x: Float[Array, "b f i j"], grid_ndim: int):
    """Insert singleton dims so a (b, f, i, j) matrix broadcasts over a grid."""
    for _ in range(grid_ndim):
        x = x[:, :, None]
    return x


def compute_forward_flow(
    surfaces: Float[Array, "b f *grid 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
) -> Float[Array, "b p *grid 2"]:
    """Positions of earlier-frame surface points seen from the later frame.

    forward_transformation = later^-1 @ earlier (cam_i -> world -> cam_{i+1}).
    Reference: `projection.py:143-162`.
    """
    forward_transformation = jnp.einsum(
        "...ij,...jk->...ik", rigid_inverse(later(extrinsics)), earlier(extrinsics)
    )
    grid_ndim = surfaces.ndim - 3
    return reproject_points(
        earlier(surfaces),
        _expand_for_grid(forward_transformation, grid_ndim),
        _expand_for_grid(later(intrinsics), grid_ndim),
    )


def compute_backward_flow(
    surfaces: Float[Array, "b f *grid 3"],
    extrinsics: Float[Array, "b f 4 4"],
    intrinsics: Float[Array, "b f 3 3"],
) -> Float[Array, "b p *grid 2"]:
    """Positions of later-frame surface points seen from the earlier frame.

    backward_transformation = earlier^-1 @ later. Reference: `projection.py:165-184`.
    """
    backward_transformation = jnp.einsum(
        "...ij,...jk->...ik", rigid_inverse(earlier(extrinsics)), later(extrinsics)
    )
    grid_ndim = surfaces.ndim - 3
    return reproject_points(
        later(surfaces),
        _expand_for_grid(backward_transformation, grid_ndim),
        _expand_for_grid(earlier(intrinsics), grid_ndim),
    )


def get_extrinsics(
    inverse_relative_transformations: Float[Array, "*b p 4 4"],
) -> Float[Array, "*b p1 4 4"]:
    """Compose per-pair transforms into camera poses (P_0 = I) via prefix product.

    Each input T_i = (P_i^-1 @ P_{i+1}) maps frame i+1's camera space into
    frame i's; hence P_n = T_0 @ T_1 @ ... @ T_{n-1}. The reference composes
    this with a serial Python loop (`projection.py:187-210`); here it is a
    log-depth `associative_scan` over batched 4x4 matmuls, which also admits a
    distributed formulation when the pair axis is sharded across devices.
    """
    prefix = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b),
        inverse_relative_transformations,
        axis=inverse_relative_transformations.ndim - 3,
    )
    *batch, _, _, _ = inverse_relative_transformations.shape
    identity = jnp.broadcast_to(
        jnp.eye(4, dtype=inverse_relative_transformations.dtype),
        (*batch, 1, 4, 4),
    )
    return jnp.concatenate([identity, prefix], axis=-3)


def focal_lengths_to_intrinsics(
    focal_lengths: Float[Array, "*b"],
    image_shape: tuple[int, int],
) -> Float[Array, "*b 3 3"]:
    """Normalized focal length(s) -> normalized K.

    The focal length is scaled by sqrt(h*w) so candidates are aspect-ratio
    invariant, then re-normalized per axis (reference:
    `flowmap/model/intrinsics/common.py:6-20`).
    """
    h, w = image_shape
    focal_lengths = focal_lengths * (h * w) ** 0.5
    fx = focal_lengths / w
    fy = focal_lengths / h
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    half = jnp.full_like(fx, 0.5)
    return jnp.stack(
        [
            jnp.stack([fx, zero, half], axis=-1),
            jnp.stack([zero, fy, half], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
