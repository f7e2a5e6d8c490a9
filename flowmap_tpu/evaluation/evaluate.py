"""Offline evaluation of exported reconstructions.

Parity target: the reference's paper tooling (`paper/common.py:163-238`) —
ATE of an exported COLMAP model against dataset ground truth or a COLMAP
pseudo-ground-truth reconstruction, aggregated into per-scene tables. (The
NVS metrics — PSNR/SSIM/LPIPS after 3DGS — require the external
gaussian-splatting pipeline in both the reference and here.)

Canonical evaluation scenes and exclusions are recorded in EVAL_SCENES,
matching `paper/common.py:97-160`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..export.colmap import read_colmap_model
from ..utils.ate import camera_centers, compute_ate

# Canonical evaluation scene lists (reference `paper/common.py:97-160`,
# including the documented failure-case exclusions).
EVAL_SCENES = {
    "llff": ["fern", "flower", "fortress", "horns", "orchids", "room", "trex"],
    "mipnerf360": ["bonsai", "kitchen", "counter"],
    "tandt": [
        "barn", "caterpillar", "church", "courthouse", "family", "francis",
        "horse", "ignatius", "m60", "museum", "panther", "playground",
        "train", "truck",
    ],
    "co3d": ["bench", "hydrant"],
}


def _match_by_name(
    names_a: list[str], names_b: list[str]
) -> tuple[list[int], list[int]]:
    common = sorted(set(names_a) & set(names_b))
    index_a = {n: i for i, n in enumerate(names_a)}
    index_b = {n: i for i, n in enumerate(names_b)}
    return [index_a[n] for n in common], [index_b[n] for n in common]


def evaluate_against_colmap(
    predicted_sparse: Path,
    reference_sparse: Path,
) -> dict:
    """ATE between two COLMAP models, matched by image name
    (`paper/common.py:212-221`)."""
    pred_ext, _, pred_names = read_colmap_model(predicted_sparse)
    ref_ext, _, ref_names = read_colmap_model(reference_sparse)
    ia, ib = _match_by_name(pred_names, ref_names)
    if len(ia) < 3:
        return {"ate": float("nan"), "matched_frames": len(ia)}
    ate, _, _ = compute_ate(
        camera_centers(ref_ext[ib]), camera_centers(pred_ext[ia])
    )
    return {"ate": ate, "matched_frames": len(ia)}


def evaluate_scene_dir(
    scene_dir: Path,
    gt_extrinsics: Optional[np.ndarray] = None,
    reference_sparse: Optional[Path] = None,
) -> dict:
    """Evaluate one exported scene directory (colmap/sparse/0 layout)."""
    scene_dir = Path(scene_dir)
    sparse = scene_dir / "colmap/sparse/0"
    if not sparse.exists():
        sparse = scene_dir / "sparse/0"
    result: dict = {"scene": scene_dir.name}

    runtime_file = scene_dir / "runtime.json"
    if runtime_file.exists():
        result.update(json.loads(runtime_file.read_text()))

    pred_ext, _, _ = read_colmap_model(sparse)
    if gt_extrinsics is not None:
        ate, _, _ = compute_ate(
            camera_centers(np.asarray(gt_extrinsics)), camera_centers(pred_ext)
        )
        result["ate_vs_gt"] = ate
    if reference_sparse is not None:
        result.update(
            {
                f"{k}_vs_colmap": v
                for k, v in evaluate_against_colmap(sparse, reference_sparse).items()
            }
        )
    return result


def scene_table(results: list[dict]) -> str:
    """Render per-scene results as an aligned text table with a mean row."""
    if not results:
        return "(no results)"
    keys = [k for k in results[0] if k != "scene"]
    header = ["scene"] + keys
    rows = [[r["scene"]] + [f"{r.get(k, float('nan')):.5g}" for k in keys] for r in results]
    numeric = {
        k: np.nanmean([float(r.get(k, np.nan)) for r in results]) for k in keys
    }
    rows.append(["mean"] + [f"{numeric[k]:.5g}" for k in keys])
    widths = [max(len(str(row[i])) for row in [header] + rows) for i in range(len(header))]
    lines = ["  ".join(str(v).ljust(w) for v, w in zip(row, widths)) for row in [header] + rows]
    return "\n".join(lines)


def check_model(sparse_dir: Path) -> dict:
    """Sanity-check an exported COLMAP model (the reference's
    `scripts/colmap/check_models.py` role): frame count, finite poses,
    plausible focal lengths."""
    sparse_dir = Path(sparse_dir)
    problems: list[str] = []
    try:
        extrinsics, intrinsics, names = read_colmap_model(sparse_dir)
    except Exception as e:
        return {"ok": False, "problems": [f"unreadable: {e}"]}

    if len(names) == 0:
        problems.append("no registered images")
    if not np.all(np.isfinite(extrinsics)):
        problems.append("non-finite extrinsics")
    focals = intrinsics[:, 0, 0]
    if np.any(focals <= 0.05) or np.any(focals > 20):
        problems.append(f"implausible focal range [{focals.min()}, {focals.max()}]")
    dets = np.linalg.det(extrinsics[:, :3, :3])
    if np.any(np.abs(dets - 1) > 1e-2):
        problems.append("rotations are not orthonormal")
    return {"ok": not problems, "problems": problems, "num_images": len(names)}
