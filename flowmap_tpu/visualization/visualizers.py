"""Validation-time visualizers: summary panels and trajectory/ATE.

Parity: `flowmap/visualization/visualizer_summary.py:21-95` (tiled GT video /
colormapped depth / GT-vs-predicted backward flow wheels / correspondence
weights) and `visualizer_trajectory.py:23-109` (ATE metric + aligned 3D
trajectory plot, optional per-step ATE JSON dump). Returns a dict mapping keys
to HWC float images or scalar metrics, exactly like the reference's
`Visualizer.visualize` contract.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional, Sequence, Union

import numpy as np

from ..ops.geometry import compute_backward_flow, sample_image_grid
from ..types import Batch, Flows, ModelOutput, Tracks
from ..utils.ate import camera_centers, compute_ate
from .color import apply_color_map_to_depth, flow_to_color


@dataclass(frozen=True)
class VisualizerSummaryCfg:
    name: Literal["summary"] = "summary"
    num_vis_frames: int = 8


@dataclass(frozen=True)
class VisualizerTrajectoryCfg:
    name: Literal["trajectory"] = "trajectory"
    generate_plot: bool = True
    ate_save_root: Optional[Path] = None


VisualizerCfg = Union[VisualizerSummaryCfg, VisualizerTrajectoryCfg]


def _hcat(images: list[np.ndarray]) -> np.ndarray:
    h = max(im.shape[0] for im in images)
    padded = [
        np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)), constant_values=1.0)
        for im in images
    ]
    return np.concatenate(padded, axis=1)


def _vcat(images: list[np.ndarray]) -> np.ndarray:
    w = max(im.shape[1] for im in images)
    padded = [
        np.pad(im, ((0, 0), (0, w - im.shape[1]), (0, 0)), constant_values=1.0)
        for im in images
    ]
    return np.concatenate(padded, axis=0)


def visualize_summary(
    cfg: VisualizerSummaryCfg,
    batch: Batch,
    flows: Flows,
    model_output: ModelOutput,
    rng: Optional[np.random.Generator] = None,
) -> dict[str, np.ndarray]:
    """Tiled panel over a window of frames (reference picks a random 8-frame
    window, `visualizer_summary.py:42-95`)."""
    rng = rng or np.random.default_rng(0)
    _, f, _, h, w = batch.videos.shape
    n = min(cfg.num_vis_frames, f - 1)
    start = int(rng.integers(0, f - n)) if f - 1 > n else 0
    sel = range(start, start + n)

    videos = np.asarray(batch.videos[0])
    depths = np.asarray(model_output.depths[0])
    weights = np.asarray(model_output.backward_correspondence_weights[0])

    import jax

    xy, _ = sample_image_grid((h, w))
    bwd_pred = np.asarray(
        jax.jit(compute_backward_flow)(
            model_output.surfaces, model_output.extrinsics, model_output.intrinsics
        )[0]
    ) - np.asarray(xy)
    bwd_gt = np.asarray(flows.backward[0])

    max_mag = max(np.abs(bwd_gt[list(sel)]).max(), 1e-6)
    rows = []
    rows.append(_hcat([videos[i].transpose(1, 2, 0) for i in sel]))
    rows.append(_hcat([apply_color_map_to_depth(depths[i]) for i in sel]))
    rows.append(_hcat([flow_to_color(bwd_gt[i], max_mag) for i in sel]))
    rows.append(_hcat([flow_to_color(bwd_pred[i], max_mag) for i in sel]))
    rows.append(
        _hcat([np.repeat(weights[i][..., None], 3, axis=-1) for i in sel])
    )
    return {"summary": np.clip(_vcat(rows), 0.0, 1.0)}


def visualize_trajectory(
    cfg: VisualizerTrajectoryCfg,
    batch: Batch,
    model_output: ModelOutput,
    global_step: int,
) -> dict[str, np.ndarray]:
    """ATE vs. GT poses + orthographic 3D trajectory plot
    (`visualizer_trajectory.py:23-109`)."""
    out: dict[str, np.ndarray] = {}
    if batch.extrinsics is None:
        return out

    gt = camera_centers(np.asarray(batch.extrinsics[0]))
    pred = camera_centers(np.asarray(model_output.extrinsics[0]))
    ate, aligned_gt, aligned_pred = compute_ate(gt, pred)
    out["metrics/ate"] = np.asarray(ate)

    if cfg.ate_save_root is not None:
        root = Path(cfg.ate_save_root)
        root.mkdir(parents=True, exist_ok=True)
        with open(root / f"ate_{global_step:0>6}.json", "w") as fp:
            json.dump({"step": int(global_step), "ate": float(ate)}, fp)

    if cfg.generate_plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(6, 6), dpi=100)
        ax = fig.add_subplot(projection="3d")
        ax.plot(*aligned_gt.T, label="ground truth", color="tab:blue")
        ax.plot(*aligned_pred.T, label="estimate", color="tab:orange")
        ax.set_proj_type("ortho")
        ax.legend()
        ax.set_title(f"ATE: {ate:.6f}")
        fig.canvas.draw()
        image = np.asarray(fig.canvas.buffer_rgba())[..., :3] / 255.0
        plt.close(fig)
        out["trajectory"] = image.astype(np.float32)

    return out


def run_visualizers(
    cfgs: Sequence[VisualizerCfg],
    batch: Batch,
    flows: Flows,
    tracks: Optional[Sequence[Tracks]],
    model_output: ModelOutput,
    global_step: int,
) -> dict[str, np.ndarray]:
    results: dict[str, np.ndarray] = {}
    for cfg in cfgs:
        if isinstance(cfg, VisualizerSummaryCfg):
            results.update(visualize_summary(cfg, batch, flows, model_output))
        elif isinstance(cfg, VisualizerTrajectoryCfg):
            results.update(
                visualize_trajectory(cfg, batch, model_output, global_step)
            )
        else:
            raise ValueError(f"unknown visualizer: {cfg}")
    return results
