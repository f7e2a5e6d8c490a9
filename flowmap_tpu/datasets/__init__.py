from .dataset import (
    DatasetCOLMAP,
    DatasetCOLMAPCfg,
    DatasetImages,
    DatasetImagesCfg,
    DatasetLLFF,
    DatasetLLFFCfg,
    DatasetMerged,
    Stage,
    example_to_batch,
)
from .dataset_pretrain import (
    DatasetCO3D,
    DatasetCO3DCfg,
    DatasetRE10k,
    DatasetRE10kCfg,
)
from .frame_sampler import (
    FrameSamplerCfg,
    FrameSamplerOverfitCfg,
    FrameSamplerPretrainCfg,
    sample_frames,
)

DATASETS = {
    "co3d": DatasetCO3D,
    "colmap": DatasetCOLMAP,
    "images": DatasetImages,
    "llff": DatasetLLFF,
    "re10k": DatasetRE10k,
}

from typing import Union  # noqa: E402

DatasetCfg = Union[
    DatasetCO3DCfg,
    DatasetCOLMAPCfg,
    DatasetImagesCfg,
    DatasetLLFFCfg,
    DatasetRE10kCfg,
]


def get_dataset(
    dataset_cfgs: list,
    stage: Stage,
    frame_sampler_cfg: FrameSamplerCfg,
) -> DatasetMerged:
    """Registry factory (reference: `flowmap/dataset/__init__.py:28-37`)."""
    datasets = [
        DATASETS[cfg.name](cfg, stage, frame_sampler_cfg) for cfg in dataset_cfgs
    ]
    return DatasetMerged(datasets)


__all__ = [
    "DATASETS",
    "DatasetCO3D",
    "DatasetCO3DCfg",
    "DatasetRE10k",
    "DatasetRE10kCfg",
    "DatasetCfg",
    "DatasetCOLMAP",
    "DatasetCOLMAPCfg",
    "DatasetImages",
    "DatasetImagesCfg",
    "DatasetLLFF",
    "DatasetLLFFCfg",
    "DatasetMerged",
    "FrameSamplerCfg",
    "FrameSamplerOverfitCfg",
    "FrameSamplerPretrainCfg",
    "Stage",
    "example_to_batch",
    "get_dataset",
    "sample_frames",
]
