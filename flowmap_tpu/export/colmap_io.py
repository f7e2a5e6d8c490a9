"""COLMAP sparse-model I/O (binary and text), implemented from the public
format specification (https://colmap.github.io/format.html).

Replaces the reference's vendored `flowmap/third_party/colmap/read_write_model.py`
with a compact NumPy implementation covering the camera models FlowMap
touches (SIMPLE_PINHOLE, PINHOLE) plus the generic parameter table for
reading foreign reconstructions.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# model_name -> (model_id, num_params), per the COLMAP format spec.
CAMERA_MODELS = {
    "SIMPLE_PINHOLE": (0, 3),
    "PINHOLE": (1, 4),
    "SIMPLE_RADIAL": (2, 4),
    "RADIAL": (3, 5),
    "OPENCV": (4, 8),
    "OPENCV_FISHEYE": (5, 8),
    "FULL_OPENCV": (6, 12),
    "FOV": (7, 5),
    "SIMPLE_RADIAL_FISHEYE": (8, 4),
    "RADIAL_FISHEYE": (9, 5),
    "THIN_PRISM_FISHEYE": (10, 12),
}
CAMERA_MODEL_IDS = {mid: (name, n) for name, (mid, n) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: tuple[float, ...]


@dataclass
class Image:
    id: int
    qvec: np.ndarray  # (4,) w x y z
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    point3d_ids: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.int64))


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2d_idxs: np.ndarray


def _read(fid, fmt: str):
    size = struct.calcsize("<" + fmt)
    return struct.unpack("<" + fmt, fid.read(size))


def _write(fid, fmt: str, *values):
    fid.write(struct.pack("<" + fmt, *values))


# ---------------------------------------------------------------------------
# Binary format
# ---------------------------------------------------------------------------


def read_cameras_binary(path: Path) -> dict[int, Camera]:
    cameras = {}
    with open(path, "rb") as fid:
        (num,) = _read(fid, "Q")
        for _ in range(num):
            cam_id, model_id, width, height = _read(fid, "iiQQ")
            name, n_params = CAMERA_MODEL_IDS[model_id]
            params = _read(fid, "d" * n_params)
            cameras[cam_id] = Camera(cam_id, name, width, height, params)
    return cameras


def write_cameras_binary(cameras: dict[int, Camera], path: Path) -> None:
    with open(path, "wb") as fid:
        _write(fid, "Q", len(cameras))
        for cam in cameras.values():
            model_id, n_params = CAMERA_MODELS[cam.model]
            _write(fid, "iiQQ", cam.id, model_id, cam.width, cam.height)
            _write(fid, "d" * n_params, *[float(p) for p in cam.params])


def read_images_binary(path: Path) -> dict[int, Image]:
    images = {}
    with open(path, "rb") as fid:
        (num,) = _read(fid, "Q")
        for _ in range(num):
            image_id = _read(fid, "i")[0]
            qvec = np.array(_read(fid, "dddd"))
            tvec = np.array(_read(fid, "ddd"))
            camera_id = _read(fid, "i")[0]
            name = b""
            while True:
                char = fid.read(1)
                if char == b"\x00":
                    break
                name += char
            (n_pts,) = _read(fid, "Q")
            data = np.frombuffer(
                fid.read(24 * n_pts), dtype=[("xy", "<f8", 2), ("id", "<i8")]
            )
            images[image_id] = Image(
                image_id,
                qvec,
                tvec,
                camera_id,
                name.decode("utf-8"),
                data["xy"].reshape(-1, 2).copy(),
                data["id"].copy(),
            )
    return images


def write_images_binary(images: dict[int, Image], path: Path) -> None:
    with open(path, "wb") as fid:
        _write(fid, "Q", len(images))
        for im in images.values():
            _write(fid, "i", im.id)
            _write(fid, "dddd", *[float(q) for q in im.qvec])
            _write(fid, "ddd", *[float(t) for t in im.tvec])
            _write(fid, "i", im.camera_id)
            fid.write(im.name.encode("utf-8") + b"\x00")
            n = len(im.point3d_ids)
            _write(fid, "Q", n)
            for xy, pid in zip(im.xys, im.point3d_ids):
                _write(fid, "ddq", float(xy[0]), float(xy[1]), int(pid))


def read_points3d_binary(path: Path) -> dict[int, Point3D]:
    points = {}
    with open(path, "rb") as fid:
        (num,) = _read(fid, "Q")
        for _ in range(num):
            pid = _read(fid, "q")[0]
            xyz = np.array(_read(fid, "ddd"))
            rgb = np.array(_read(fid, "BBB"))
            error = _read(fid, "d")[0]
            (track_len,) = _read(fid, "Q")
            data = np.frombuffer(
                fid.read(8 * track_len), dtype=[("image_id", "<i4"), ("idx", "<i4")]
            )
            points[pid] = Point3D(
                pid, xyz, rgb, error, data["image_id"].copy(), data["idx"].copy()
            )
    return points


def write_points3d_binary(points: dict[int, Point3D], path: Path) -> None:
    with open(path, "wb") as fid:
        _write(fid, "Q", len(points))
        for pt in points.values():
            _write(fid, "q", pt.id)
            _write(fid, "ddd", *[float(v) for v in pt.xyz])
            _write(fid, "BBB", *[int(v) for v in pt.rgb])
            _write(fid, "d", float(pt.error))
            _write(fid, "Q", len(pt.image_ids))
            for iid, idx in zip(pt.image_ids, pt.point2d_idxs):
                _write(fid, "ii", int(iid), int(idx))


# ---------------------------------------------------------------------------
# Text format
# ---------------------------------------------------------------------------


def read_cameras_text(path: Path) -> dict[int, Camera]:
    cameras = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        cam_id = int(parts[0])
        cameras[cam_id] = Camera(
            cam_id,
            parts[1],
            int(parts[2]),
            int(parts[3]),
            tuple(float(p) for p in parts[4:]),
        )
    return cameras


def read_images_text(path: Path) -> dict[int, Image]:
    images = {}
    lines = [
        line.strip()
        for line in open(path)
        if line.strip() and not line.startswith("#")
    ]
    for header, points in zip(lines[::2], lines[1::2]):
        parts = header.split()
        image_id = int(parts[0])
        qvec = np.array([float(v) for v in parts[1:5]])
        tvec = np.array([float(v) for v in parts[5:8]])
        camera_id = int(parts[8])
        name = parts[9]
        elems = points.split()
        xys = np.array(
            [[float(x), float(y)] for x, y in zip(elems[0::3], elems[1::3])]
        ).reshape(-1, 2)
        ids = np.array([int(i) for i in elems[2::3]], np.int64)
        images[image_id] = Image(image_id, qvec, tvec, camera_id, name, xys, ids)
    return images


def write_cameras_text(cameras: dict[int, Camera], path: Path) -> None:
    with open(path, "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for cam in cameras.values():
            params = " ".join(str(float(p)) for p in cam.params)
            f.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")


def write_images_text(images: dict[int, Image], path: Path) -> None:
    with open(path, "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for im in images.values():
            q = " ".join(str(float(v)) for v in im.qvec)
            t = " ".join(str(float(v)) for v in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
            pts = " ".join(
                f"{float(xy[0])} {float(xy[1])} {int(pid)}"
                for xy, pid in zip(im.xys, im.point3d_ids)
            )
            f.write(pts + "\n")


# ---------------------------------------------------------------------------
# Model-level API
# ---------------------------------------------------------------------------


def read_model(path: Path):
    """Read a sparse model directory (.bin preferred, .txt fallback).

    Returns (cameras, images, points3d) or None if no model is present.
    points3d may be None (FlowMap writes points as a .ply instead).
    """
    path = Path(path)
    if (path / "cameras.bin").exists():
        cameras = read_cameras_binary(path / "cameras.bin")
        images = read_images_binary(path / "images.bin")
        points = (
            read_points3d_binary(path / "points3D.bin")
            if (path / "points3D.bin").exists()
            else None
        )
        return cameras, images, points
    if (path / "cameras.txt").exists():
        cameras = read_cameras_text(path / "cameras.txt")
        images = read_images_text(path / "images.txt")
        return cameras, images, None
    return None


def write_model(
    cameras: dict[int, Camera],
    images: dict[int, Image],
    points3d: dict[int, Point3D] | None,
    path: Path,
) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    write_cameras_binary(cameras, path / "cameras.bin")
    write_images_binary(images, path / "images.bin")
    write_points3d_binary(points3d or {}, path / "points3D.bin")
