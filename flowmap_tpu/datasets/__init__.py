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
    seed: int = 0,
) -> DatasetMerged:
    """Registry factory (reference: `flowmap/dataset/__init__.py:28-37`).

    `seed` differentiates shuffling across data-parallel ranks (the
    reference's `seed + global_rank` worker seeding,
    `flowmap/dataset/data_module_pretrain.py:56-61`)."""
    datasets = []
    for cfg in dataset_cfgs:
        cls = DATASETS[cfg.name]
        if cfg.name in ("co3d", "re10k"):
            datasets.append(cls(cfg, stage, frame_sampler_cfg, seed=seed))
        else:
            datasets.append(cls(cfg, stage, frame_sampler_cfg))
    return DatasetMerged(datasets, seed=seed)


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
