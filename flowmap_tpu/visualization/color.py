"""Colormapping utilities for depth and optical flow.

Parity: `flowmap/visualization/depth.py` (log-normalized inverted inferno) and
the flow_vis_torch wheel coloring used by `visualizer_summary.py`. Host-side
NumPy/matplotlib (visualization only).
"""

from __future__ import annotations

import numpy as np


def apply_color_map_to_depth(depth: np.ndarray) -> np.ndarray:
    """Depth (h, w) -> inferno RGB (h, w, 3), log-normalized and inverted so
    near is bright (reference: `visualization/depth.py`)."""
    import matplotlib.cm as cm

    depth = np.asarray(depth, dtype=np.float64)
    log_depth = np.log(np.clip(depth, 1e-6, None))
    lo, hi = log_depth.min(), log_depth.max()
    normalized = (log_depth - lo) / (hi - lo + 1e-12)
    return cm.inferno(1.0 - normalized)[..., :3].astype(np.float32)


def _flow_color_wheel() -> np.ndarray:
    """Standard 55-bin Middlebury color wheel."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel


_WHEEL = _flow_color_wheel()


def flow_to_color(flow: np.ndarray, max_magnitude: float | None = None) -> np.ndarray:
    """Flow (h, w, 2) -> Middlebury wheel RGB (h, w, 3) in [0, 1]."""
    u = np.asarray(flow[..., 0], np.float64)
    v = np.asarray(flow[..., 1], np.float64)
    magnitude = np.sqrt(u * u + v * v)
    if max_magnitude is None:
        max_magnitude = max(magnitude.max(), 1e-6)
    u = u / max_magnitude
    v = v / max_magnitude
    magnitude = np.clip(magnitude / max_magnitude, 0, 1)

    ncols = _WHEEL.shape[0]
    angle = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    fk = (angle + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = fk - np.floor(fk)

    color = (1 - f[..., None]) * _WHEEL[k0] + f[..., None] * _WHEEL[k1]
    color = color / 255.0
    # Desaturate with radius (standard Middlebury convention).
    color = 1 - magnitude[..., None] * (1 - color)
    return color.astype(np.float32)
