"""Paper-figure generation: ATE-vs-step plots, trajectory figures, and
point-cloud renders from exported models.

Parity targets: `/root/reference/paper/plot_ablation_ate.py` (log-scale ATE
curves per ablation), `paper/generate_trajectory_plots.py` (Procrustes-aligned
PCA-oriented 3D ortho trajectory plots per scene), and
`paper/render_point_cloud.py:40-140` (isometric point-cloud + camera-frustum
renders). All pure NumPy/matplotlib — figures are host-side tooling, not
device work.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..export.colmap import read_colmap_model
from ..ops.geometry import sample_image_grid  # noqa: F401  (docs cross-ref)


# ---------------------------------------------------------------------------
# ATE-vs-step plot (reference paper/plot_ablation_ate.py)
# ---------------------------------------------------------------------------


def load_ate_series(path: Path) -> list[float]:
    """Load an ATE curve: either one JSON list file (<tag>.json, the
    reference's format) or a directory of per-step `ate_XXXXXX.json` dumps
    (this repo's `dump_ate` experiment output)."""
    path = Path(path)
    if path.is_dir():
        steps = sorted(path.glob("ate_*.json"))
        series = []
        for f in steps:
            with f.open() as fp:
                series.append(float(json.load(fp)["ate"]))
        return series
    with path.open() as fp:
        data = json.load(fp)
    if isinstance(data, dict):
        return [float(data["ate"])]
    return [float(v) for v in data]


def plot_ate_curves(
    curves: dict[str, list[float]],
    out_path: Path,
    colors: Optional[dict[str, str]] = None,
    max_steps: int = 2000,
) -> None:
    """Log-scale ATE-vs-step figure (reference plot_ablation_ate.py:20-37)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 2))
    for name, series in curves.items():
        color = (colors or {}).get(name)
        xs = np.linspace(0, max_steps, len(series)) if len(series) > 1 else [0]
        ax.plot(xs, series, color=color, label=name)
    ax.set_yscale("log")
    ax.grid(axis="y", which="major", color="#eee")
    ax.grid(axis="y", which="minor", color="#eee")
    ax.set_xlim(0, max_steps)
    ax.set_xticks(np.linspace(0, max_steps, 6).astype(int))
    ax.legend(fontsize=6)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
# Trajectory figures (reference paper/generate_trajectory_plots.py)
# ---------------------------------------------------------------------------


def _procrustes_pair(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """scipy.spatial.procrustes semantics: both point sets centered, unit
    Frobenius norm, b similarity-aligned onto a."""
    from scipy.spatial import procrustes

    m1, m2, _ = procrustes(a, b)
    return m1, m2


def _pca_rotation(points: np.ndarray, flip: bool = False) -> np.ndarray:
    """Orient a trajectory by its principal axes, re-orthogonalized the way
    the reference does (generate_trajectory_plots.py:35-46)."""
    centered = points - points.mean(axis=0)
    # PCA components = right singular vectors (rows of Vt), variance order.
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    x, y, _ = vt.T  # columns of components^T, as the reference indexes them
    z = np.cross(x, y)
    y = np.cross(z, x)
    rotation = np.linalg.inv(np.stack([x, y, z]))
    return rotation[[0, 2, 1]] if flip else rotation


def camera_centers_from_model(model_dir: Path) -> np.ndarray:
    extrinsics, _, _ = read_colmap_model(Path(model_dir))
    return extrinsics[:, :3, 3]


def plot_trajectories(
    trajectories: dict[str, np.ndarray],
    out_path: Path,
    colors: Optional[dict[str, str]] = None,
    flip: bool = False,
    squash: float = 0.6,
) -> None:
    """Aligned 3D ortho trajectory figure. The FIRST entry is the alignment
    target and draws dashed (the reference's COLMAP pseudo-GT convention)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(trajectories)
    trajs = [np.asarray(trajectories[n], np.float64) for n in names]
    if len(trajs) > 1:
        trajs[1:] = [_procrustes_pair(trajs[0], t)[1] for t in trajs[1:]]
        trajs[0] = _procrustes_pair(trajs[0], trajs[1])[0]
    else:
        trajs[0] = _procrustes_pair(trajs[0], trajs[0])[0]

    rotation = _pca_rotation(trajs[0], flip)
    trajs = [t @ rotation.T for t in trajs]

    fig = plt.figure(figsize=(2.4, 2.4), dpi=200)
    ax = fig.add_subplot(1, 1, 1, projection="3d")
    ax.set_proj_type("ortho")
    ax.view_init(elev=30, azim=45)
    for i, (name, t) in enumerate(zip(names, trajs)):
        ax.plot3D(
            *t.T,
            color=(colors or {}).get(name),
            linewidth=0.5,
            linestyle="--" if i == 0 and len(trajs) > 1 else "-",
            label=name,
        )

    points = np.concatenate(trajs)
    minima, maxima = points.min(axis=0), points.max(axis=0)
    span = (maxima - minima).max() * np.array([1.0, 1.0, squash])
    means = 0.5 * (maxima + minima)
    starts, ends = means - 0.5 * span, means + 0.5 * span
    ax.set_xlim(starts[0], ends[0])
    ax.set_ylim(starts[1], ends[1])
    ax.set_zlim(starts[2], ends[2])
    ax.set_aspect("equal")
    for axis in (ax.xaxis, ax.yaxis, ax.zaxis):
        axis.set_ticklabels([])
    ax.legend(fontsize=5)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
# Point-cloud render (reference paper/render_point_cloud.py)
# ---------------------------------------------------------------------------

# Isometric projection + depth-ordering look vector
# (render_point_cloud.py:92-107).
_ISO_PROJECTION = np.asarray([[2.0, 1.0], [0.0, 2.25], [2.0, -1.0]], np.float32)
_ISO_LOOK = np.asarray([1.0, -1.0, -1.0], np.float32)


def isometric_project(
    points: np.ndarray,  # (..., 3) world space
    midpoint: np.ndarray,  # (3,)
    scale: float,
    canvas_size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Project to canvas xy + return back-to-front depth ordering."""
    xy = (points - midpoint) @ _ISO_PROJECTION
    xy = xy * scale + 0.5 * canvas_size
    depth = points @ _ISO_LOOK
    ordering = np.argsort(depth.reshape(-1)).reshape(depth.shape)
    return xy, ordering


def frustum_lines(
    extrinsics: np.ndarray,  # (f, 4, 4) c2w
    intrinsics: np.ndarray,  # (f, 3, 3) normalized
    z_value: float,
) -> np.ndarray:
    """Per-frame frustum wireframes, (f, 2, 8, 3): 8 line segments/camera
    (image-plane rectangle + 4 rays to the origin), reference
    render_point_cloud.py:40-81. Corners sit OUTSIDE the image rectangle by
    half its span (xy*2-0.5), matching the reference's stylized frusta."""
    f = extrinsics.shape[0]
    # Corner xys of a (2, 2) half-pixel-centered grid, scaled as xy*2-0.5.
    base = np.asarray(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], np.float32
    )
    corners = base * 2.0 - 0.5  # (4, 2)
    all_lines = []
    for i in range(f):
        k = intrinsics[i]
        fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
        dirs = np.stack(
            [(corners[:, 0] - cx) / fx, (corners[:, 1] - cy) / fy,
             np.ones(4, np.float32)],
            axis=-1,
        )
        rays = dirs / dirs[:, 2:] * z_value  # (4, 3) camera space
        pts = np.concatenate([np.zeros((1, 3), np.float32), rays], axis=0)
        h = np.concatenate([pts, np.ones((5, 1), np.float32)], axis=-1)
        world = (extrinsics[i] @ h.T).T[:, :3]  # (5, 3): o, a, b, c, d
        o, a, b, c, d = world
        lines = [(a, b), (b, d), (d, c), (c, a), (o, c), (o, a), (o, b), (o, d)]
        all_lines.append(np.stack([np.stack(l, axis=0) for l in lines], axis=1))
    return np.stack(all_lines, axis=0)  # (f, 2, 8, 3)


@dataclass
class PointCloudRenderCfg:
    canvas_size: int = 1024
    scale: float = 150.0
    point_radius: float = 2.0
    frustum_z: float = 0.5
    max_points: int = 20000
    background: float = 1.0


def render_point_cloud(
    xyz: np.ndarray,  # (p, 3) world-space points
    rgb: np.ndarray,  # (p, 3) in [0, 1]
    extrinsics: np.ndarray,  # (f, 4, 4) c2w
    intrinsics: np.ndarray,  # (f, 3, 3) normalized
    cfg: PointCloudRenderCfg = PointCloudRenderCfg(),
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Isometric render: colored surface points (painter's order) + frustum
    wireframes for first/last cameras. Returns (3, canvas, canvas) in [0,1]."""
    from ..visualization.drawing import draw_lines, draw_points

    rng = rng or np.random.default_rng(0)
    if xyz.shape[0] > cfg.max_points:
        pick = rng.choice(xyz.shape[0], cfg.max_points, replace=False)
        xyz, rgb = xyz[pick], rgb[pick]

    midpoint = 0.5 * (xyz.max(axis=0) + xyz.min(axis=0))
    canvas = np.full(
        (3, cfg.canvas_size, cfg.canvas_size), cfg.background, np.float32
    )

    xy, ordering = isometric_project(xyz, midpoint, cfg.scale, cfg.canvas_size)
    xy, rgb_sorted = xy[ordering], rgb[ordering]
    canvas = draw_points(
        canvas, xy, rgb_sorted, radius=cfg.point_radius, supersample=2
    )

    frusta = frustum_lines(extrinsics, intrinsics, cfg.frustum_z)
    for i in (0, extrinsics.shape[0] - 1):
        start_xy, _ = isometric_project(
            frusta[i, 0], midpoint, cfg.scale, cfg.canvas_size
        )
        end_xy, _ = isometric_project(
            frusta[i, 1], midpoint, cfg.scale, cfg.canvas_size
        )
        canvas = draw_lines(
            canvas, start_xy, end_xy, color=(0.1, 0.1, 0.1), width=2.0
        )
    return np.clip(canvas, 0.0, 1.0)


def unproject_exports(
    depths: np.ndarray,  # (b, f, h, w)
    intrinsics: np.ndarray,  # (b, f, 3, 3)
    extrinsics: np.ndarray,  # (b, f, 4, 4)
    colors: Optional[np.ndarray] = None,  # (b, f, 3, h, w)
    stride: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """World-space point cloud from an exports.npz dict (every `stride`-th
    pixel), the figure-side analogue of the COLMAP PLY export."""
    b, f, h, w = depths.shape
    assert b == 1
    ys = (np.arange(0, h, stride) + 0.5) / h
    xs = (np.arange(0, w, stride) + 0.5) / w
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    xyz_all, rgb_all = [], []
    for i in range(f):
        k = intrinsics[0, i]
        d = depths[0, i, ::stride, ::stride]
        dirs = np.stack(
            [(gx - k[0, 2]) / k[0, 0], (gy - k[1, 2]) / k[1, 1],
             np.ones_like(gx)],
            axis=-1,
        )
        cam = dirs * d[..., None]
        hpts = np.concatenate([cam, np.ones_like(cam[..., :1])], axis=-1)
        world = (extrinsics[0, i] @ hpts.reshape(-1, 4).T).T[:, :3]
        xyz_all.append(world)
        if colors is not None:
            rgb_all.append(
                colors[0, i, :, ::stride, ::stride].reshape(3, -1).T
            )
        else:
            rgb_all.append(np.full((world.shape[0], 3), 0.5, np.float32))
    return np.concatenate(xyz_all), np.concatenate(rgb_all)
