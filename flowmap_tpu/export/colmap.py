"""COLMAP-format export/import of estimated cameras, depths, and point clouds.

Parity: `flowmap/export/colmap.py:56-214`. Exports a `sparse/0` model
(PINHOLE cameras, world-to-camera quaternions) plus a dense, per-frame
unprojected point cloud as `points3D.ply` for 3DGS/NeRF downstream use, and
reads models back (for DatasetCOLMAP ground truth and evaluation).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from ..ops.geometry import sample_image_grid, unproject
from ..types import ModelExports
from .colmap_io import Camera, Image, read_model, write_model
from .ply import write_ply


def _matrix_to_quaternion(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), Shepperd's method."""
    from scipy.spatial.transform import Rotation as R

    qx, qy, qz, qw = R.from_matrix(m).as_quat()
    return np.array([qw, qx, qy, qz])


def _quaternion_to_matrix(qwxyz: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R

    qw, qx, qy, qz = qwxyz
    return R.from_quat([qx, qy, qz, qw]).as_matrix()


def center_crop_intrinsics_np(
    intrinsics: np.ndarray,
    old_shape: tuple[int, int],
    new_shape: tuple[int, int],
) -> np.ndarray:
    """Adjust normalized intrinsics for a center crop (cropping.py:53-69)."""
    h_old, w_old = old_shape
    h_new, w_new = new_shape
    intrinsics = np.array(intrinsics, copy=True)
    intrinsics[..., 0, 0] *= w_old / w_new
    intrinsics[..., 1, 1] *= h_old / h_new
    return intrinsics


def write_colmap_model(
    path: Path,
    extrinsics: np.ndarray,  # (f, 4, 4) cam2world
    intrinsics: np.ndarray,  # (f, 3, 3) normalized
    image_names: list[str],
    image_shape: tuple[int, int],
) -> None:
    h, w = image_shape
    cameras = {}
    images = {}
    for index, (c2w, k, name) in enumerate(
        zip(np.asarray(extrinsics), np.asarray(intrinsics), image_names)
    ):
        cam_id = index + 1
        k = np.array(k, copy=True)
        k[0] *= w
        k[1] *= h
        cameras[cam_id] = Camera(
            cam_id, "PINHOLE", w, h, (k[0, 0], k[1, 1], k[0, 2], k[1, 2])
        )

        w2c = np.linalg.inv(c2w)
        images[cam_id] = Image(
            id=cam_id,
            qvec=_matrix_to_quaternion(w2c[:3, :3]),
            tvec=w2c[:3, 3],
            camera_id=cam_id,
            name=name,
        )
    write_model(cameras, images, None, Path(path))


def read_colmap_model(
    path: Path,
    reorder: bool = True,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Read (extrinsics c2w (f,4,4), normalized intrinsics (f,3,3), names)."""
    model = read_model(Path(path))
    if model is None:
        raise FileNotFoundError(path)
    cameras, images, _ = model

    all_extrinsics, all_intrinsics, all_names = [], [], []
    for image in images.values():
        camera = cameras[image.camera_id]
        k = np.eye(3)
        if camera.model == "SIMPLE_PINHOLE":
            fx, cx, cy = camera.params
            fy = fx
        elif camera.model == "PINHOLE":
            fx, fy, cx, cy = camera.params
        else:
            raise ValueError(f"unsupported camera model: {camera.model}")
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
        k[0] /= camera.width
        k[1] /= camera.height
        all_intrinsics.append(k)

        w2c = np.eye(4)
        w2c[:3, :3] = _quaternion_to_matrix(image.qvec)
        w2c[:3, 3] = image.tvec
        all_extrinsics.append(np.linalg.inv(w2c))
        all_names.append(image.name)

    if reorder:
        order = np.argsort(all_names)
        all_extrinsics = [all_extrinsics[i] for i in order]
        all_intrinsics = [all_intrinsics[i] for i in order]
        all_names = [all_names[i] for i in order]

    return (
        np.stack(all_extrinsics).astype(np.float32),
        np.stack(all_intrinsics).astype(np.float32),
        all_names,
    )


def export_to_colmap(
    exports: ModelExports,
    frame_paths: list[Path] | None,
    uncropped_exports_shape: tuple[int, int],
    uncropped_videos_shape: tuple[int, int],
    path: Path,
) -> None:
    """Write sparse/0 (cameras + images + points3D.ply) and copy frames.

    `uncropped_exports_shape` undoes the patch-size center crop applied during
    optimization; `uncropped_videos_shape` is the full-resolution image size
    recorded in the COLMAP camera (reference: `export/colmap.py:56-111`).
    """
    path = Path(path)
    depths = np.asarray(exports.depths)
    intrinsics = np.asarray(exports.intrinsics)
    extrinsics = np.asarray(exports.extrinsics)
    colors = np.asarray(exports.colors)
    _, f, h_cropped, w_cropped = depths.shape

    intrinsics_uncropped = center_crop_intrinsics_np(
        intrinsics, (h_cropped, w_cropped), uncropped_exports_shape
    )

    if frame_paths is None:
        names = [f"{i:0>6}.png" for i in range(f)]
    else:
        names = [p.name for p in frame_paths]

    sparse_path = path / "sparse/0"
    write_colmap_model(
        sparse_path,
        extrinsics[0],
        intrinsics_uncropped[0],
        names,
        uncropped_videos_shape,
    )

    # Dense per-frame unprojected point cloud as .ply (3DGS-compatible).
    import jax.numpy as jnp

    xy, _ = sample_image_grid((h_cropped, w_cropped))
    points, point_colors = [], []
    for i in range(f):
        xyz = unproject(xy, jnp.asarray(depths[0, i]), jnp.asarray(intrinsics[0, i]))
        xyz_h = np.concatenate(
            [np.asarray(xyz), np.ones((*xyz.shape[:-1], 1), np.float32)], axis=-1
        )
        world = np.einsum("ij,hwj->hwi", extrinsics[0, i], xyz_h)[..., :3]
        points.append(world.reshape(-1, 3))
        point_colors.append(colors[0, i].transpose(1, 2, 0).reshape(-1, 3))

    sparse_path.mkdir(parents=True, exist_ok=True)
    write_ply(
        sparse_path / "points3D.ply",
        np.concatenate(points),
        np.concatenate(point_colors),
    )

    if frame_paths is not None:
        (path / "images").mkdir(exist_ok=True, parents=True)
        for frame_path in frame_paths:
            shutil.copy(frame_path, path / "images" / frame_path.name)
