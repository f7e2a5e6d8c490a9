"""Surface-alignment golden tests: pose recovery from exact flow."""

import jax.numpy as jnp
import numpy as np

from flowmap_tpu.ops.geometry import sample_image_grid, unproject
from flowmap_tpu.ops.surface import align_surfaces, compute_track_flow
from flowmap_tpu.types import Tracks
from flowmap_tpu.utils.synthetic import SyntheticSceneCfg, make_scene


def test_align_surfaces_recovers_gt_poses():
    """With GT depth and exact backward flow, Procrustes alignment must
    reproduce the GT camera chain (up to the first-frame gauge)."""
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=8, image_shape=(48, 64))
    )
    h, w = 48, 64
    xy, _ = sample_image_grid((h, w))
    surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])

    indices = jnp.arange(0, h * w, 3)
    weights = flows.backward_mask  # valid-correspondence weighting
    poses = align_surfaces(surfaces, flows.backward, weights, indices)

    # Gauge-align: both chains start at identity relative to frame 0.
    gt = np.asarray(batch.extrinsics[0])
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    got = np.asarray(poses[0])

    np.testing.assert_allclose(got[0], np.eye(4), atol=1e-5)
    np.testing.assert_allclose(got, gt_rel, atol=2e-2)
    # Rotation component should be tight.
    np.testing.assert_allclose(
        got[:, :3, :3], gt_rel[:, :3, :3], atol=5e-3
    )


def test_compute_track_flow_identity():
    """Tracks projected through the GT cameras land exactly on themselves."""
    batch, flows, depths = make_scene(
        SyntheticSceneCfg(num_frames=5, image_shape=(32, 48))
    )
    h, w = 32, 48
    xy, _ = sample_image_grid((h, w))
    surfaces = unproject(xy, depths, batch.intrinsics[:, :, None, None])

    rng = np.random.default_rng(0)
    query = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 5, 16, 2)), jnp.float32)
    tracks = Tracks(xy=query, visibility=jnp.ones((1, 5, 16), bool), start_frame=0)
    xy_target, visibility = compute_track_flow(
        surfaces, batch.extrinsics, batch.intrinsics, tracks
    )
    # Diagonal (source == target) must reproduce the query points.
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(xy_target[0, i, i]), np.asarray(query[0, i]), atol=5e-4
        )
    assert bool(visibility.any())
