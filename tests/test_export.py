"""Round-trip tests for COLMAP and PLY I/O."""

import numpy as np
import pytest

from flowmap_tpu.export import (
    export_to_colmap,
    read_colmap_model,
    read_ply,
    write_colmap_model,
)
from flowmap_tpu.export.colmap_io import (
    Camera,
    Image,
    Point3D,
    read_model,
    write_model,
)
from flowmap_tpu.types import ModelExports


def random_pose(rng):
    from flowmap_tpu.ops.procrustes import quaternion_to_matrix
    import jax.numpy as jnp

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    pose[:3, 3] = rng.normal(size=3)
    return pose


def test_colmap_model_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f = 5
    extrinsics = np.stack([random_pose(rng) for _ in range(f)])
    intrinsics = np.broadcast_to(
        np.array([[1.2, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1]], np.float32), (f, 3, 3)
    )
    names = [f"{i:0>6}.png" for i in range(f)]
    write_colmap_model(tmp_path / "sparse/0", extrinsics, intrinsics, names, (480, 640))

    ext2, int2, names2 = read_colmap_model(tmp_path / "sparse/0")
    assert names2 == names
    np.testing.assert_allclose(ext2, extrinsics, atol=1e-5)
    np.testing.assert_allclose(int2, intrinsics, atol=1e-6)


def test_colmap_binary_points_roundtrip(tmp_path):
    cameras = {1: Camera(1, "SIMPLE_PINHOLE", 64, 48, (50.0, 32.0, 24.0))}
    images = {
        1: Image(
            1,
            np.array([1.0, 0, 0, 0]),
            np.zeros(3),
            1,
            "a.png",
            np.array([[1.0, 2.0]]),
            np.array([7], np.int64),
        )
    }
    points = {
        7: Point3D(
            7,
            np.array([1.0, 2.0, 3.0]),
            np.array([255, 128, 0]),
            0.5,
            np.array([1], np.int32),
            np.array([0], np.int32),
        )
    }
    write_model(cameras, images, points, tmp_path)
    cams2, ims2, pts2 = read_model(tmp_path)
    assert cams2[1].model == "SIMPLE_PINHOLE"
    assert ims2[1].name == "a.png"
    np.testing.assert_allclose(ims2[1].xys, [[1.0, 2.0]])
    np.testing.assert_allclose(pts2[7].xyz, [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(pts2[7].rgb, [255, 128, 0])


def test_export_to_colmap_full(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    f, h, w = 3, 16, 24
    exports = ModelExports(
        extrinsics=jnp.asarray(np.stack([random_pose(rng) for _ in range(f)])[None]),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]), (1, f, 3, 3)
        ),
        colors=jnp.asarray(rng.uniform(size=(1, f, 3, h, w)).astype(np.float32)),
        depths=jnp.asarray(rng.uniform(1, 5, size=(1, f, h, w)).astype(np.float32)),
    )
    export_to_colmap(exports, None, (18, 24), (180, 240), tmp_path)

    assert (tmp_path / "sparse/0/cameras.bin").exists()
    assert (tmp_path / "sparse/0/images.bin").exists()
    xyz, rgb = read_ply(tmp_path / "sparse/0/points3D.ply")
    assert xyz.shape == (f * h * w, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    ext, intr, names = read_colmap_model(tmp_path / "sparse/0")
    assert len(names) == f
    np.testing.assert_allclose(ext, np.asarray(exports.extrinsics[0]), atol=1e-5)
