from .loss import LossCfg, LossFlowCfg, LossTrackingCfg, compute_losses
from .mapping import MappingCfg, apply_mapping, fix_aspect_ratio

__all__ = [
    "LossCfg",
    "LossFlowCfg",
    "LossTrackingCfg",
    "MappingCfg",
    "apply_mapping",
    "compute_losses",
    "fix_aspect_ratio",
]
