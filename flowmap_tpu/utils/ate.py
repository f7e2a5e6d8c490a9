"""Absolute trajectory error via similarity (Procrustes) alignment.

Parity: `flowmap/misc/ate.py:7-24` — `scipy.spatial.procrustes` standardizes
both trajectories (centered, unit Frobenius norm, optimal rotation), then the
ATE is the RMSE of the difference. Host-side NumPy/SciPy: this is an eval-only
metric on tiny (frames, 3) arrays.
"""

from __future__ import annotations

import numpy as np
from scipy import spatial


def compute_ate(
    gt: np.ndarray,  # (point, 3)
    predicted: np.ndarray,  # (point, 3)
) -> tuple[float, np.ndarray, np.ndarray]:
    """Returns (ate, aligned_gt, aligned_predicted)."""
    aligned_gt, aligned_predicted, _ = spatial.procrustes(
        np.asarray(gt, dtype=np.float64), np.asarray(predicted, dtype=np.float64)
    )
    ate = float(np.sqrt(np.mean((aligned_gt - aligned_predicted) ** 2)))
    return ate, aligned_gt, aligned_predicted


def camera_centers(extrinsics: np.ndarray) -> np.ndarray:
    """Camera-to-world extrinsics (f, 4, 4) -> camera centers (f, 3)."""
    return np.asarray(extrinsics)[..., :3, 3]
