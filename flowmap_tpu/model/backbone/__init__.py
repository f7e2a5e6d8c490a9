from .backbone_explicit_depth import BackboneExplicitDepthCfg
from .backbone_midas import BackboneMidasCfg
from .registry import BackboneCfg, apply_backbone, init_backbone

__all__ = [
    "BackboneCfg",
    "BackboneExplicitDepthCfg",
    "BackboneMidasCfg",
    "apply_backbone",
    "init_backbone",
]
