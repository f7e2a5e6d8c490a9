"""Binary PLY point-cloud I/O (little-endian), NumPy-only.

Replaces the reference's `plyfile` dependency (`flowmap/export/colmap.py:30-53`)
with a direct writer/reader for the xyz+normal+rgb vertex layout 3D Gaussian
Splatting expects.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_DTYPE = np.dtype(
    [
        ("x", "<f4"),
        ("y", "<f4"),
        ("z", "<f4"),
        ("nx", "<f4"),
        ("ny", "<f4"),
        ("nz", "<f4"),
        ("red", "u1"),
        ("green", "u1"),
        ("blue", "u1"),
    ]
)


def write_ply(path: Path, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Write points (n, 3) + colors (n, 3 in [0,1]) as binary PLY."""
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb)
    n = xyz.shape[0]
    data = np.empty(n, dtype=_DTYPE)
    data["x"], data["y"], data["z"] = xyz.T
    data["nx"] = data["ny"] = data["nz"] = 0.0
    rgb_u8 = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    data["red"], data["green"], data["blue"] = rgb_u8.T

    header = "\n".join(
        [
            "ply",
            "format binary_little_endian 1.0",
            f"element vertex {n}",
            "property float x",
            "property float y",
            "property float z",
            "property float nx",
            "property float ny",
            "property float nz",
            "property uchar red",
            "property uchar green",
            "property uchar blue",
            "end_header",
            "",
        ]
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def read_ply(path: Path) -> tuple[np.ndarray, np.ndarray]:
    """Read a binary PLY written by `write_ply`; returns (xyz, rgb in [0,1])."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        n = next(
            int(line.split()[-1])
            for line in header_lines
            if line.startswith("element vertex")
        )
        data = np.frombuffer(f.read(n * _DTYPE.itemsize), dtype=_DTYPE)
    xyz = np.stack([data["x"], data["y"], data["z"]], axis=-1).astype(np.float32)
    rgb = (
        np.stack([data["red"], data["green"], data["blue"]], axis=-1).astype(
            np.float32
        )
        / 255.0
    )
    return xyz, rgb
