"""Golden-value tests for the geometry core.

The reference has no tests; these encode the invariants its correctness rests
on (SURVEY.md §4): project∘unproject = id, closed-form rigid/intrinsics
inverses, pose-chain composition, induced-flow consistency with ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.ops import geometry as G


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def random_rigid(rng, n=1):
    out = np.zeros((n, 4, 4))
    for i in range(n):
        out[i, :3, :3] = random_rotation(rng)
        out[i, :3, 3] = rng.normal(size=3)
        out[i, 3, 3] = 1.0
    return out


class TestRigidInverse:
    def test_matches_numpy_inverse(self):
        rng = np.random.default_rng(0)
        t = random_rigid(rng, 8)
        got = np.asarray(G.rigid_inverse(jnp.asarray(t)))
        want = np.linalg.inv(t)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_roundtrip_identity(self):
        rng = np.random.default_rng(1)
        t = jnp.asarray(random_rigid(rng, 4))
        eye = jnp.einsum("...ij,...jk->...ik", t, G.rigid_inverse(t))
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


class TestIntrinsicsInverse:
    def test_matches_numpy(self):
        k = np.array(
            [[[1.3, 0, 0.5], [0, 0.9, 0.45], [0, 0, 1.0]]], dtype=np.float32
        )
        got = np.asarray(G.intrinsics_inverse(jnp.asarray(k)))
        np.testing.assert_allclose(got, np.linalg.inv(k), atol=1e-6)


class TestSampleImageGrid:
    def test_half_pixel_centers(self):
        xy, idx = G.sample_image_grid((2, 4))
        assert xy.shape == (2, 4, 2)
        assert idx.shape == (2, 4, 2)
        # x coordinate of first column center = 0.5/4; y of first row = 0.5/2.
        np.testing.assert_allclose(np.asarray(xy[0, 0]), [0.125, 0.25])
        np.testing.assert_allclose(np.asarray(xy[1, 3]), [0.875, 0.75])
        np.testing.assert_array_equal(np.asarray(idx[1, 3]), [1, 3])


class TestProjectUnproject:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        h, w = 12, 16
        xy, _ = G.sample_image_grid((h, w))
        k = jnp.asarray(
            [[1.1, 0, 0.5], [0, 1.4, 0.5], [0, 0, 1.0]], dtype=jnp.float32
        )
        z = jnp.asarray(rng.uniform(0.5, 3.0, size=(h, w)), dtype=jnp.float32)
        pts = G.unproject(xy, z, k)
        assert pts.shape == (h, w, 3)
        # Depth (z component) is preserved.
        np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(z), rtol=1e-5)
        # Reprojecting with identity extrinsics recovers the grid.
        xy_back, in_front = G.project(pts, jnp.eye(4), k)
        np.testing.assert_allclose(
            np.asarray(xy_back), np.asarray(xy), atol=2e-4
        )
        assert bool(jnp.all(in_front))

    def test_project_through_pose(self):
        rng = np.random.default_rng(3)
        pose = jnp.asarray(random_rigid(rng, 1)[0], dtype=jnp.float32)
        k = jnp.asarray(
            [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], dtype=jnp.float32
        )
        # A point 2m in front of the camera along its optical axis projects to
        # the principal point.
        cam_point = jnp.asarray([0.0, 0.0, 2.0, 1.0])
        world_point = G.transform_cam2world(cam_point, pose)[:3]
        xy, in_front = G.project(world_point, pose, k)
        np.testing.assert_allclose(np.asarray(xy), [0.5, 0.5], atol=1e-5)
        assert bool(in_front)


class TestPoseChain:
    def test_matches_serial_loop(self):
        rng = np.random.default_rng(4)
        n_pairs = 7
        rel = random_rigid(rng, n_pairs)[None]  # (1, pairs, 4, 4)
        got = np.asarray(G.get_extrinsics(jnp.asarray(rel, dtype=jnp.float32)))
        # Serial reference semantics (projection.py:187-210).
        want = [np.eye(4)]
        pose = np.eye(4)
        for i in range(n_pairs):
            pose = pose @ rel[0, i]
            want.append(pose)
        want = np.stack(want)[None]
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got.shape == (1, n_pairs + 1, 4, 4)

    def test_batched(self):
        rng = np.random.default_rng(5)
        rel = np.stack([random_rigid(rng, 5), random_rigid(rng, 5)])
        got = G.get_extrinsics(jnp.asarray(rel))
        assert got.shape == (2, 6, 4, 4)
        np.testing.assert_allclose(np.asarray(got[:, 0]), np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-6)


class TestInducedFlow:
    def test_forward_flow_identity_when_static(self):
        """With identical poses, induced flow returns the original grid."""
        h, w, f = 8, 10, 4
        xy, _ = G.sample_image_grid((h, w))
        k = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (1, f, 3, 3)
        )
        poses = jnp.broadcast_to(jnp.eye(4), (1, f, 4, 4))
        depths = jnp.ones((1, f, h, w))
        surfaces = G.unproject(xy, depths, k[:, :, None, None])
        fwd = G.compute_forward_flow(surfaces, poses, k)
        bwd = G.compute_backward_flow(surfaces, poses, k)
        np.testing.assert_allclose(
            np.asarray(fwd), np.broadcast_to(np.asarray(xy), (1, f - 1, h, w, 2)),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(bwd), np.broadcast_to(np.asarray(xy), (1, f - 1, h, w, 2)),
            atol=1e-5,
        )

    def test_forward_flow_translating_camera(self):
        """Camera translating +x: points appear to move -x in the next frame."""
        h, w, f = 8, 10, 2
        xy, _ = G.sample_image_grid((h, w))
        k = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (1, f, 3, 3)
        )
        poses = np.broadcast_to(np.eye(4), (1, f, 4, 4)).copy()
        poses[0, 1, 0, 3] = 0.1  # second camera 0.1 to the right
        depths = jnp.full((1, f, h, w), 2.0)
        surfaces = G.unproject(xy, depths, k[:, :, None, None])
        fwd = G.compute_forward_flow(surfaces, jnp.asarray(poses), k)
        delta = np.asarray(fwd[0, 0]) - np.asarray(xy)
        # Expected parallax: -t_x * f / z = -0.1 * 1.0 / 2.0 = -0.05 in x.
        np.testing.assert_allclose(delta[..., 0], -0.05, atol=1e-5)
        np.testing.assert_allclose(delta[..., 1], 0.0, atol=1e-5)


class TestFocalLengthsToIntrinsics:
    def test_shape_and_values(self):
        k = G.focal_lengths_to_intrinsics(jnp.asarray([1.0, 2.0]), (100, 400))
        assert k.shape == (2, 3, 3)
        scale = (100 * 400) ** 0.5  # 200
        np.testing.assert_allclose(np.asarray(k[0, 0, 0]), scale / 400, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(k[0, 1, 1]), scale / 100, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(k[1, 0, 0]), 2 * scale / 400, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(k[:, 0, 2]), 0.5)
        np.testing.assert_allclose(np.asarray(k[:, 2, 2]), 1.0)


class TestGradients:
    def test_pose_chain_gradient_finite(self):
        rng = np.random.default_rng(6)
        rel = jnp.asarray(random_rigid(rng, 5)[None], dtype=jnp.float32)

        def loss(rel):
            return jnp.sum(G.get_extrinsics(rel)[..., :3, 3] ** 2)

        g = jax.grad(loss)(rel)
        assert bool(jnp.all(jnp.isfinite(g)))
