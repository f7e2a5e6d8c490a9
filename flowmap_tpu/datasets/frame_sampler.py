"""Frame-index sampling strategies.

Parity: `flowmap/frame_sampler/frame_sampler_overfit.py:19-33` (whole video,
optionally clipped/strided) and `frame_sampler_pretrain.py:17-32` (random
contiguous window with clamp-padding for short videos).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional, Union

import numpy as np


@dataclass(frozen=True)
class FrameSamplerOverfitCfg:
    name: Literal["overfit"] = "overfit"
    start: Optional[int] = None
    num_frames: Optional[int] = None
    step: Optional[int] = None


@dataclass(frozen=True)
class FrameSamplerPretrainCfg:
    name: Literal["pretrain"] = "pretrain"
    num_frames: int = 8


FrameSamplerCfg = Union[FrameSamplerOverfitCfg, FrameSamplerPretrainCfg]


def sample_frames(
    cfg: FrameSamplerCfg,
    num_frames_in_video: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    if isinstance(cfg, FrameSamplerOverfitCfg):
        start = cfg.start or 0
        num_frames = cfg.num_frames or num_frames_in_video
        step = cfg.step or 1
        return np.arange(start, start + num_frames * step, step)

    assert isinstance(cfg, FrameSamplerPretrainCfg)
    if num_frames_in_video < cfg.num_frames:
        indices = np.arange(cfg.num_frames)
        indices[indices >= num_frames_in_video] = num_frames_in_video - 1
        return indices
    rng = rng or np.random.default_rng()
    start = int(rng.integers(0, num_frames_in_video - cfg.num_frames + 1))
    return np.arange(start, start + cfg.num_frames)
