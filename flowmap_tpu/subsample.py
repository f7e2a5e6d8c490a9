"""Dataset prep CLI: `python -m flowmap_tpu.subsample [overrides...]`.

Parity: `flowmap/subsample.py:42-156` — ffmpeg video -> frames, then pick
`target_num_frames` frames spaced evenly by cumulative mean optical flow
(pairwise adjacent-frame flow magnitude), randomly filling any remainder
(seed 0, matching the reference's selection procedure).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from .utils.contracts import maybe_install_shape_contracts

maybe_install_shape_contracts()  # FLOWMAP_CHECK_SHAPES=1 (reference overfit.py:16-19)

from .config.loader import compose_config
from .flow.predictors import FlowPredictorCfg, FlowPredictorGMFlowCfg
from .ops.resize import resize_bilinear
from .utils.cropping import center_crop_images, compute_patch_cropped_shape


@dataclass(frozen=True)
class SubsampleCfg:
    in_path: Path = Path("video.mp4")
    out_path: Path = Path("frames")
    target_num_frames: int = 150
    flow_resolution: int = 43200
    limit_num_seconds: Optional[float] = None
    flow: FlowPredictorCfg = field(default_factory=FlowPredictorGMFlowCfg)


def video_to_frames(
    in_path: Path,
    out_path: Path,
    limit_num_seconds: Optional[float],
) -> None:
    """Convert a video to frames with ffmpeg (`subsample.py:70-80`)."""
    out_path.mkdir(exist_ok=True, parents=True)
    command = ["ffmpeg", "-i", str(in_path)]
    if limit_num_seconds is not None:
        command += ["-t", str(limit_num_seconds)]
    command += [f"{out_path}/frame_%06d.png"]
    if subprocess.run(command).returncode != 0:
        raise ValueError("ffmpeg conversion failed")


def _load_resized(path: Path, resolution: int) -> jnp.ndarray:
    image = np.asarray(Image.open(path), np.float32)[..., :3] / 255.0
    image = jnp.asarray(image.transpose(2, 0, 1))  # (3, h, w)
    _, h, w = image.shape
    scale = (resolution / (h * w)) ** 0.5
    return resize_bilinear(
        image[None], (round(h * scale), round(w * scale))
    )[0]


def subsample_frames(
    predict_flow: Callable,  # (1, 2, 3, h, w) videos -> (1, 1, h, w, 2)
    full_video_path: Path,
    subsampled_path: Path,
    target_num_frames: int,
    flow_resolution: int,
) -> None:
    frames = sorted(full_video_path.iterdir())
    if len(frames) <= target_num_frames:
        subsampled_path.parent.mkdir(exist_ok=True, parents=True)
        shutil.copytree(full_video_path, subsampled_path)
        return

    last = None
    mean_flows: list[float] = []
    for path in frames:
        current = _load_resized(path, flow_resolution)
        if last is not None:
            videos = jnp.stack([last, current])[None]
            new_shape = compute_patch_cropped_shape(videos.shape[-2:], 8)
            videos = center_crop_images(videos, new_shape)
            flow = predict_flow(videos)
            mean_flows.append(
                float(jnp.mean(jnp.linalg.norm(flow, axis=-1)))
            )
        last = current

    # Greedy accumulation to evenly-flow-spaced frames (`subsample.py:134-156`).
    flow_step = sum(mean_flows) / target_num_frames
    remaining = 0.0
    subsampled_path.mkdir(exist_ok=True, parents=True)
    num_saved = 0
    for mean_flow, frame in zip(mean_flows, frames):
        if remaining <= 0:
            shutil.copy(frame, subsampled_path / frame.name)
            remaining += flow_step
            num_saved += 1
        remaining -= mean_flow

    generator = np.random.default_rng(seed=0)
    paths = list(full_video_path.iterdir())
    while num_saved < target_num_frames:
        frame = paths[generator.choice(len(paths))]
        if (subsampled_path / frame.name).exists():
            continue
        shutil.copy(frame, subsampled_path / frame.name)
        num_saved += 1

    assert num_saved == target_num_frames


def _make_flow_fn(cfg: FlowPredictorCfg) -> Callable:
    if isinstance(cfg, FlowPredictorGMFlowCfg):
        from .flow.gmflow import GMFlowPredictor

        return GMFlowPredictor(cfg)
    from .flow.predictors import FlowPredictorRaftCfg

    if isinstance(cfg, FlowPredictorRaftCfg):
        from .flow.raft import RaftPredictor

        return RaftPredictor(cfg)
    raise ValueError(f"subsample flow predictor: {cfg.name}")


def subsample(cfg: SubsampleCfg) -> None:
    predict = _make_flow_fn(cfg.flow)
    with tempfile.TemporaryDirectory() as work_dir:
        work_dir = Path(work_dir)
        if Path(cfg.in_path).is_dir():
            frame_dir = Path(cfg.in_path)
        else:
            video_to_frames(Path(cfg.in_path), work_dir, cfg.limit_num_seconds)
            frame_dir = work_dir
        subsample_frames(
            predict,
            frame_dir,
            Path(cfg.out_path),
            cfg.target_num_frames,
            cfg.flow_resolution,
        )


def main() -> None:
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    cfg = compose_config("subsample", SubsampleCfg, sys.argv[1:])
    subsample(cfg)


if __name__ == "__main__":
    main()
