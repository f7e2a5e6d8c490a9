"""Root config dataclasses.

Parity: `flowmap/config/common.py:16-51`, `config/overfit.py:10-15`,
`config/pretrain.py:8-17` — the same typed tree, minus Lightning/wandb-specific
knobs that have local equivalents.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Literal, Optional

from ..datasets import DatasetCfg, FrameSamplerCfg
from ..flow import FlowPredictorCfg
from ..loss import LossCfg
from ..model import ModelCfg
from ..tracking import TrackPrecomputationCfg, TrackPredictorCfg
from ..utils.cropping import CroppingCfg
from ..visualization import VisualizerCfg


@dataclass(frozen=True)
class WandbCfg:
    project: str = "flowmap"
    mode: Literal["online", "offline", "disabled"] = "disabled"
    name: Optional[str] = None
    group: Optional[str] = None
    tags: Optional[list[str]] = None


@dataclass(frozen=True)
class CheckpointCfg:
    every_n_train_steps: int = 2000
    load: Optional[str] = None


@dataclass(frozen=True)
class TrainerCfg:
    val_check_interval: int = 50
    max_steps: int = 2000
    # Frame sharding of the per-scene step over local devices ("auto"/"none")
    # and the cross-shard collective implementation ("gspmd"/"explicit") —
    # see training/overfit.py OverfitTrainerCfg.
    sharding: Literal["auto", "none"] = "auto"
    collectives: Literal["gspmd", "explicit"] = "gspmd"
    # Round scene frame counts up to a multiple so one compiled step serves
    # a whole dataset sweep (exact — see utils/buckets.py). None/1 = off.
    frame_bucket: Optional[int] = None


@dataclass(frozen=True)
class ModelWrapperCfg:
    lr: float = 3e-5
    patch_size: int = 32
    num_vis_frames: int = 8


@dataclass(frozen=True)
class CommonCfg:
    model: ModelCfg
    dataset: list[DatasetCfg]
    loss: list[LossCfg]
    wandb: WandbCfg = field(default_factory=WandbCfg)
    checkpoint: CheckpointCfg = field(default_factory=CheckpointCfg)
    trainer: TrainerCfg = field(default_factory=TrainerCfg)
    flow: FlowPredictorCfg = None  # type: ignore[assignment]
    frame_sampler: FrameSamplerCfg = None  # type: ignore[assignment]
    visualizer: list[VisualizerCfg] = field(default_factory=list)
    cropping: CroppingCfg = field(default_factory=CroppingCfg)
    model_wrapper: ModelWrapperCfg = field(default_factory=ModelWrapperCfg)


@dataclass(frozen=True)
class OverfitCfg(CommonCfg):
    tracking: Optional[TrackPredictorCfg] = None
    track_precomputation: TrackPrecomputationCfg = field(
        default_factory=TrackPrecomputationCfg
    )
    local_save_root: Optional[Path] = None
    ate_save_root: Optional[Path] = None
    output_dir: Path = Path("outputs/local")


@dataclass(frozen=True)
class DataLoaderStageCfg:
    batch_size: int = 16
    num_workers: int = 16
    persistent_workers: bool = True
    seed: int = 123


@dataclass(frozen=True)
class DataModulePretrainCfg:
    train: DataLoaderStageCfg = field(default_factory=DataLoaderStageCfg)
    val: DataLoaderStageCfg = field(
        default_factory=lambda: DataLoaderStageCfg(batch_size=1, num_workers=1, seed=234)
    )


@dataclass(frozen=True)
class PretrainCfg(CommonCfg):
    data_module: DataModulePretrainCfg = field(default_factory=DataModulePretrainCfg)
    output_dir: Path = Path("outputs/pretrain")
